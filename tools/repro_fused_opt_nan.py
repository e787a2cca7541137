"""Minimal repro for the axon-TPU fused-train-step numeric regression
(docs/PERF.md "Measurement rules"): a single compiled program containing
forward+backward+optimizer computes NaN for a forward that the grads-only
program computes finitely — same params, same batch.  First observed
2026-08-20; reproduced with bare optax.adamw, with the jnp AND Pallas
lookup impls, and with round-2 code that trained finitely on-chip on
2026-08-17 — i.e. a runtime/compiler regression, not a model change.

This script IS the artifact: it runs the same batch through
  (a) the SPLIT path (grads program + optimizer-apply program), and
  (b) the FUSED path (one program),
prints loss/grad-norm/param-delta finiteness for both plus an environment
fingerprint, and exits 1 if the regression reproduces (fused nonfinite
while split finite), 0 if the runtime is healthy.

RETIRE CONDITION for the workaround: when this script exits 0 on the axon
TPU runtime AT THE ORIGINAL TRIGGER SHAPES (--h 320 --w 736 --iters 16,
the reference training crop) as well as the defaults, flip the
`split = jax.default_backend() == "tpu"` default in
anystereo_tpu/train/step.py:88-91 back to fused, update the note in
docs/PERF.md, and keep the script as a regression canary.
STATUS 2026-08-21: exits 0 (NO REPRO) at the default shapes on-chip —
the regression appears fixed; the big-shape confirmation is pending.

Usage: python tools/repro_fused_opt_nan.py [--h 96] [--w 160] [--iters 4]
(CPU note: on non-TPU backends both paths are expected finite — the script
then reports "no repro" and exits 0.)
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fingerprint(jax) -> dict:
    import jaxlib

    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "python": platform.python_version(),
        "platform": platform.platform(),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
    }


def _finite(tree) -> bool:
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.isfinite(l).all()) for l in leaves)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--w", type=int, default=160)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--max-disp", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig, TrainConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.train.optimizer import make_optimizer
    from anystereo_tpu.train.state import create_train_state
    from anystereo_tpu.train.step import make_train_step
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print(json.dumps(_fingerprint(jax)), flush=True)

    cfg = ModelConfig(max_disp=args.max_disp)
    model = AnyStereo(cfg)
    b, h, w, q = args.b, args.h, args.w, args.q
    rng = np.random.RandomState(0)
    batch = {
        "left": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "right": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "coords": jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99),
        "gt": jnp.asarray(rng.rand(b, q).astype(np.float32) * 30),
        "valid": jnp.ones((b, q), np.float32),
        "scale": jnp.ones((b,), np.float32),
        "gt_low": jnp.asarray(rng.rand(b, h // 4, w // 4).astype(np.float32) * 8),
    }
    variables = jax.jit(
        lambda k: model.init(
            k, batch["left"], batch["right"], iters=1, coords=batch["coords"],
            scale=batch["scale"],
        )
    )(jax.random.PRNGKey(0))

    results = {}
    for name, split in (("split", True), ("fused", False)):
        tcfg = TrainConfig(
            train_iters=args.iters,
            batch_size=b,
            supervise_init=True,
            split_opt_step=split,
        )
        tx = make_optimizer(
            tcfg.lr, tcfg.weight_decay, tcfg.num_steps, tcfg.grad_clip,
            skip_nonfinite=False,  # observe the raw NaN, don't mask it
        )
        # fresh buffer copy per variant: the split path DONATES the state
        # to its optimizer-apply program, which would delete the shared
        # params out from under the other variant
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = create_train_state(params, tx)
        step = make_train_step(model, tcfg)
        new_state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        loss = float(metrics["loss"])
        gnorm = float(metrics["grad_norm"])
        params_finite = _finite(new_state.params)
        results[name] = {
            "loss": loss,
            "grad_norm": gnorm,
            "params_finite": params_finite,
            "finite": bool(np.isfinite(loss) and np.isfinite(gnorm))
            and params_finite,
        }
        print(f"{name:5s}: loss={loss:.6f} grad_norm={gnorm:.4f} "
              f"params_finite={params_finite}", flush=True)

    repro = results["split"]["finite"] and not results["fused"]["finite"]
    print(json.dumps({"repro": repro, **results}))
    if repro:
        print("REPRO: fused fwd+bwd+optimizer program is nonfinite while the "
              "split path is finite — the axon runtime regression is still "
              "present; keep TrainConfig.split_opt_step defaulting to split.",
              file=sys.stderr)
        return 1
    print("NO REPRO on this backend/runtime"
          + (" — the axon regression appears FIXED: see the retire condition "
             "in this file's docstring." if jax.default_backend() == "tpu"
             else " (expected off-TPU)."))
    return 0


if __name__ == "__main__":
    sys.exit(main())
