"""Fast seeded learning-quality assert (VERDICT r4 next #5): a ~1-minute
fixed-seed, fixed-batch 30-step training run whose loss trajectory must
stay inside a calibrated band.  Runs in the default fast suite on every
invocation — catches optimizer / loss / VJP regressions that the small
equivalence tests miss and that the 25-minute env-gated long gate
(test_train_gate.py) would only catch when someone remembers to run it.

The batch is a deterministic synthetic stereo pair: the right image is the
left image warped by a known constant disparity, so the sequence loss has
real signal to descend.  Spec for the recipe under test:
train_continuous_IGEV.py:125-134,183-281 (AdamW + OneCycle + grad-clip 1.0
+ exponentially-weighted sequence loss)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import ModelConfig, TrainConfig
from anystereo_tpu.nn.model import AnyStereo
from anystereo_tpu.train.optimizer import make_optimizer
from anystereo_tpu.train.state import create_train_state
from anystereo_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow  # ~1 min warm (persistent compile cache); the
# first cold run on a machine pays the CPU jit_step compile (minutes)


def _synthetic_batch(b=1, h=64, w=64, disp=4.0, seed=3):
    """Left = smooth random texture; right = left shifted by `disp` px."""
    rng = np.random.RandomState(seed)
    base = rng.rand(b, h, w + 16, 3).astype(np.float32)
    # box-blur for horizontal structure the matcher can lock onto
    k = np.ones(5, np.float32) / 5
    base = np.apply_along_axis(
        lambda v: np.convolve(v, k, mode="same"), 2, base
    )
    d = int(disp)
    left = base[:, :, d : d + w] * 255
    right = base[:, :, 0:w] * 255
    q = 128
    ys = rng.randint(2, h - 2, size=(b, q))
    xs = rng.randint(d + 2, w - 2, size=(b, q))
    coords = np.stack(
        [(ys + 0.5) / h * 2 - 1, (xs + 0.5) / w * 2 - 1], axis=-1
    ).astype(np.float32)
    return {
        "left": jnp.asarray(left),
        "right": jnp.asarray(right),
        "coords": jnp.asarray(coords),
        "gt": jnp.full((b, q), disp, jnp.float32),
        "valid": jnp.ones((b, q), jnp.float32),
        "scale": jnp.ones((b,), jnp.float32),
        "gt_low": jnp.full((b, h // 4, w // 4), disp / 4, jnp.float32),
    }


def test_loss_trajectory_band():
    # The CPU jit_step compile is minutes cold; the persistent compilation
    # cache makes reruns ~1 min.  The cache dir is keyed by the host CPU
    # feature set (utils.jax_cache._cpu_fingerprint) so a migrated
    # container never executes foreign AOT machine code, and the config is
    # restored afterwards so the rest of the pytest process is unaffected.
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    enable_compilation_cache()
    try:
        _run_trajectory()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def _run_trajectory():
    cfg = ModelConfig(max_disp=32)
    tcfg = TrainConfig(
        train_iters=2, batch_size=1, supervise_init=True, num_steps=1000
    )
    model = AnyStereo(cfg)
    batch = _synthetic_batch()
    variables = jax.jit(
        lambda k: model.init(
            k, batch["left"], batch["right"], iters=1,
            coords=batch["coords"], scale=batch["scale"],
        )
    )(jax.random.PRNGKey(0))
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.num_steps, tcfg.grad_clip)
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model, tcfg)

    losses = []
    for _ in range(40):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    losses = np.asarray(losses)

    print("loss trajectory:", np.round(losses, 4).tolist())
    assert np.isfinite(losses).all(), losses
    # Bands calibrated 2026-08-20 (CPU, jax 0.9.0) — see the trajectory in
    # the -s output.  The run must start near the random-init loss scale
    # and descend decisively; wide enough for compiler reassociation
    # drift but fails on any real optimizer/loss/VJP break (a dead
    # optimizer leaves loss flat at the init scale; a broken VJP diverges
    # or plateaus far above 1.5).
    head, tail = losses[:5].mean(), losses[-5:].mean()
    assert 4.0 < head < 22.0, f"init loss off-scale: {head} ({losses})"
    assert tail < 4.5, f"no learning in 40 steps: {losses}"
    assert tail < 0.55 * head, f"descent too weak: {losses}"
