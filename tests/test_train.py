"""Training-layer tests: losses vs the reference formulas, the optimizer
schedule, a real jitted train step (loss decreases on a fixed batch), and
full checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import ModelConfig, TrainConfig
from anystereo_tpu.nn.model import AnyStereo, dense_query_coords
from anystereo_tpu.train.loss import (
    _iter_weights,
    init_disp_loss,
    sequence_loss,
    sequence_loss_queries,
)
from anystereo_tpu.train.optimizer import make_optimizer, one_cycle_schedule
from anystereo_tpu.train.state import create_train_state, restore_checkpoint, save_checkpoint
from anystereo_tpu.train.step import make_train_step


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestLoss:
    def test_iter_weights_match_reference(self):
        """w_i = (gamma^(15/(N-1)))^(N-1-i) (train_continuous_IGEV.py:49-51)."""
        n, gamma = 16, 0.9
        adj = gamma ** (15 / (n - 1))
        want = [adj ** (n - 1 - i) for i in range(n)]
        got = np.asarray(_iter_weights(n, gamma))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert abs(got[-1] - 1.0) < 1e-6  # final iterate weight 1

    def test_sequence_loss_masks_invalid(self, rng):
        it, b, q = 3, 2, 50
        preds = jnp.asarray(rng.randn(it, b, q).astype(np.float32))
        gt = jnp.asarray(rng.rand(b, q).astype(np.float32) * 10)
        valid = jnp.ones((b, q))
        loss_all, m = sequence_loss_queries(preds, gt, valid, max_disp=700)
        # masking everything → loss 0
        loss_none, _ = sequence_loss_queries(preds, gt, jnp.zeros((b, q)), 700)
        assert float(loss_none) == 0.0
        assert float(loss_all) > 0
        assert 0 <= float(m["1px"]) <= 1

    def test_sequence_loss_epe_exact(self):
        preds = jnp.asarray([[[2.0, 4.0]]])  # 1 iter, B1, Q2
        gt = jnp.asarray([[1.0, 1.0]])
        valid = jnp.ones((1, 2))
        loss, m = sequence_loss_queries(preds, gt, valid, 700, gamma=0.9)
        assert abs(float(m["epe"]) - 2.0) < 1e-6  # (1+3)/2
        assert abs(float(loss) - 2.0) < 1e-6  # single iter weight 1

    def test_init_disp_loss_smooth_l1(self):
        init = jnp.asarray([[[0.5, 0.0]]])
        gt = jnp.asarray([[[0.0, 10.0]]])
        # second pixel's GT exceeds max_disp/4 = 1.25 ⇒ masked; only |0.5| term
        v = init_disp_loss(init, gt, max_disp=5.0)
        assert abs(float(v) - 0.5 * 0.25) < 1e-6  # 0.5*d^2 for d<1

    def test_dense_wrapper(self, rng):
        it, b, h, w = 2, 1, 4, 6
        preds = jnp.asarray(rng.randn(it, b, h, w).astype(np.float32))
        gt = jnp.asarray(rng.rand(b, h, w).astype(np.float32))
        valid = jnp.ones((b, h, w))
        l1, _ = sequence_loss(preds, gt, valid)
        l2, _ = sequence_loss_queries(
            preds.reshape(it, b, -1), gt.reshape(b, -1), valid.reshape(b, -1)
        )
        assert abs(float(l1) - float(l2)) < 1e-6


class TestOptimizer:
    def test_one_cycle_shape(self):
        sched = one_cycle_schedule(2e-4, 1000, 0.01)
        lrs = [float(sched(s)) for s in (0, 11, 500, 1050)]
        assert lrs[1] == pytest.approx(2e-4, rel=1e-3)  # peak right after warmup
        assert lrs[0] < lrs[1]
        assert lrs[2] < lrs[1]
        assert lrs[3] < lrs[2]

    def test_grad_clip_in_chain(self):
        tx = make_optimizer(lr=1e-3, grad_clip=1.0, num_steps=100)
        params = {"w": jnp.zeros((3,))}
        state = tx.init(params)
        big = {"w": jnp.full((3,), 100.0)}
        updates, _ = tx.update(big, state, params)
        # clipped: update magnitude bounded by lr-scale, not 100-scale
        assert float(jnp.abs(updates["w"]).max()) < 1.0

    def test_nonfinite_grads_skip_update(self):
        """The GradScaler-analog guard (train_continuous_IGEV.py:232-239):
        a NaN/inf gradient makes the step a no-op instead of poisoning the
        params, and recovery on the next finite step works."""
        tx = make_optimizer(lr=1e-3, grad_clip=1.0, num_steps=100)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
        updates, state = tx.update(bad, state, params)
        assert float(jnp.abs(updates["w"]).max()) == 0.0  # no-op step
        assert int(state.notfinite_count) == 1
        good = {"w": jnp.full((3,), 0.5)}
        updates, state = tx.update(good, state, params)
        assert jnp.isfinite(updates["w"]).all()
        assert float(jnp.abs(updates["w"]).max()) > 0.0
        assert int(state.notfinite_count) == 0

    def test_persistent_nonfinite_never_poisons(self):
        """Regression for an observed 2k-step NaN poisoning: optax's
        apply_if_finite(max_consecutive_errors=N) GIVES UP after N
        consecutive bad steps and applies the NaN update.  Our wrapper must
        keep no-op'ing forever — 1100 consecutive NaN steps leave the params
        bit-identical and the inner Adam state untouched."""
        import optax

        tx = make_optimizer(lr=1e-3, grad_clip=1.0, num_steps=100)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}

        def body(carry, _):
            p, s = carry
            updates, s = tx.update(bad, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p2, state), _ = jax.lax.scan(
            body, (params, state), None, length=1100
        )
        assert jnp.array_equal(p2["w"], params["w"])
        assert int(state.notfinite_count) == 1100
        assert int(state.total_notfinite) == 1100
        # recovery still works after the long bad streak
        updates, state = tx.update({"w": jnp.full((3,), 0.5)}, state, p2)
        assert jnp.isfinite(updates["w"]).all()
        assert float(jnp.abs(updates["w"]).max()) > 0.0
        assert int(state.notfinite_count) == 0
        assert int(state.total_notfinite) == 1100


@pytest.fixture(scope="module")
def tiny_train_setup():
    cfg = ModelConfig(max_disp=32)
    tcfg = TrainConfig(
        train_iters=2, batch_size=1, lr=1e-4, num_steps=50, supervise_init=True
    )
    model = AnyStereo(cfg)
    b, h, w, q = 1, 32, 64, 64
    rng = np.random.RandomState(0)
    batch = {
        "left": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "right": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "coords": jnp.asarray(
            (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99
        ),
        "gt": jnp.asarray(rng.rand(b, q).astype(np.float32) * 20),
        "valid": jnp.ones((b, q), np.float32),
        "scale": jnp.ones((b,), np.float32),
        "gt_low": jnp.asarray(rng.rand(b, h // 4, w // 4).astype(np.float32) * 5),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["left"],
        batch["right"],
        iters=1,
        coords=batch["coords"],
    )
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.num_steps, tcfg.grad_clip)
    state = create_train_state(variables["params"], tx)
    return model, tcfg, state, batch


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self, tiny_train_setup):
        model, tcfg, state, batch = tiny_train_setup
        # the step donates its input state — work on a copy so the
        # module-scoped fixture stays alive for the next test
        state = jax.tree_util.tree_map(jnp.copy, state)
        step = make_train_step(model, tcfg)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 5

    def test_split_opt_step_matches_fused(self, tiny_train_setup):
        """split_opt_step=True (grads and optimizer apply as two programs —
        the axon-TPU fused-program workaround, TrainConfig.split_opt_step)
        computes the same update as the fused single-program step."""
        import dataclasses

        model, tcfg, state, batch = tiny_train_setup
        s_fused = jax.tree_util.tree_map(jnp.copy, state)
        s_split = jax.tree_util.tree_map(jnp.copy, state)
        fused = make_train_step(model, dataclasses.replace(tcfg, split_opt_step=False))
        split = make_train_step(model, dataclasses.replace(tcfg, split_opt_step=True))
        s_fused, m_fused = fused(s_fused, batch)
        s_split, m_split = split(s_split, batch)
        assert "nonfinite_skips" in m_split and int(m_split["nonfinite_skips"]) == 0
        np.testing.assert_allclose(
            float(m_fused["loss"]), float(m_split["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_fused.params),
            jax.tree_util.tree_leaves(s_split.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )
        assert int(s_split.step) == 1

    def test_params_only_restore_filters_key_mismatch(self, tmp_path):
        """Warm-start from a differently-configured donor: keys present in
        both trees with matching shapes load; keys the donor lacks (or
        with different shapes) keep their fresh init — the reference's
        filtered-restore semantics (train_continuous_IGEV.py:192-200).
        A targeted StandardRestore would raise on the missing key."""
        from anystereo_tpu.train.state import restore_params_only

        donor = {
            "a": {"kernel": jnp.ones((2, 3))},
            "b": {"bias": jnp.full((4,), 7.0)},
        }
        tx = make_optimizer(lr=1e-3, grad_clip=1.0, num_steps=10)
        save_checkpoint(str(tmp_path / "d"), create_train_state(donor, tx))
        target = {
            "a": {"kernel": jnp.zeros((9, 9))},  # shape mismatch: fresh
            "b": {"bias": jnp.zeros((4,))},  # shared: loads
            "c": {"kernel": jnp.zeros((5,))},  # donor lacks it: fresh
        }
        merged = restore_params_only(str(tmp_path / "d"), target)
        np.testing.assert_array_equal(
            np.asarray(merged["b"]["bias"]), np.full((4,), 7.0)
        )
        assert float(jnp.abs(merged["c"]["kernel"]).max()) == 0.0
        assert merged["a"]["kernel"].shape == (9, 9)
        assert float(jnp.abs(merged["a"]["kernel"]).max()) == 0.0

    def test_checkpoint_roundtrip(self, tiny_train_setup, tmp_path):
        model, tcfg, state, batch = tiny_train_setup
        state = jax.tree_util.tree_map(jnp.copy, state)
        step = make_train_step(model, tcfg)
        state, _ = step(state, batch)
        save_checkpoint(str(tmp_path / "ckpt"), state)
        # restore into a fresh state
        tx = state.tx
        fresh = create_train_state(
            jax.tree_util.tree_map(jnp.zeros_like, state.params), tx
        )
        restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
        assert int(restored.step) == int(state.step)


class TestGrainResume:
    """The grain loader's get_state/set_state is wired through train():
    a preempted run resumes with the exact data order a straight run would
    have used (no repeated or skipped samples)."""

    def _make_loader(self, tmp_path, served):
        from test_data import _synthetic_dataset

        from anystereo_tpu.data.grain_loader import GrainLoader

        ds = _synthetic_dataset(
            tmp_path,
            multi_scale=True,
            scale_min=1.0,
            scale_max=1.3,
            inp_size=(64, 128),
        )
        orig = ds.__getitem__

        def recording(i, rng=None):
            served.append(int(i))
            return orig(i, rng=rng)

        ds.__getitem__ = recording
        return GrainLoader(ds, 1, seed=11)

    @staticmethod
    def _cfg(ckpt_dir, steps):
        from anystereo_tpu.config import Config

        return Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=2,
                batch_size=1,
                lr=1e-4,
                num_steps=steps,
                ckpt_every=1000,
                ckpt_dir=str(ckpt_dir),
                inp_size=(64, 128),
                scale_min=1.0,
                scale_max=1.3,
            ),
        )

    def test_exactly_once_data_order_across_resume(self, tmp_path):
        from anystereo_tpu.train.trainer import train

        cfg = self._cfg

        # straight run: 3 steps, records the canonical batch order
        served_a = []
        train(cfg(tmp_path / "a", 3), self._make_loader(tmp_path, served_a))
        assert len(served_a) >= 3

        # preempted run: 2 steps, checkpoint (+ loader sidecar), resume to 3
        served_b1, served_b2 = [], []
        train(cfg(tmp_path / "b", 2), self._make_loader(tmp_path, served_b1))
        import glob

        assert glob.glob(str(tmp_path / "b" / "loader_state-2-*.bin")), (
            "loader state sidecar not saved next to the checkpoint"
        )
        state = train(
            cfg(tmp_path / "b", 3), self._make_loader(tmp_path, served_b2)
        )
        assert int(state.step) == 3
        # fetch pattern (CheckpointablePrefetch runs one batch ahead):
        # run A fetches batches 0..3 for steps 0..2; run B part 1 fetches
        # 0..2 for steps 0..1; part 2 makes two pre-restore fetches (wrapper
        # buffer + init batch), then the restored order continues with the
        # straight run's batches 2,3 — the step-2 batch is never repeated
        # or skipped
        assert served_b1 == served_a[:3]
        assert served_b2[2:] == served_a[2:4]

    def test_emergency_checkpoint_replays_failed_batch(
        self, tmp_path, monkeypatch
    ):
        """A step failure saves an emergency checkpoint whose loader
        sidecar points at the FAILED step's batch — resume trains that
        step on the same data instead of silently skipping it."""
        import glob

        import anystereo_tpu.train.trainer as trainer_mod
        from anystereo_tpu.train.trainer import train

        # canonical order from a straight 3-step run
        served_a = []
        train(self._cfg(tmp_path / "a", 3),
              self._make_loader(tmp_path, served_a))

        real_make = trainer_mod.make_train_step
        calls = {"n": 0}

        def failing_make(model, tcfg, mesh=None, mesh_cfg=None):
            real = real_make(model, tcfg, mesh=mesh, mesh_cfg=mesh_cfg)

            def step(state, batch):
                if calls["n"] == 1:  # fail on the second step (i=1)
                    calls["n"] += 1
                    raise RuntimeError("injected step failure")
                calls["n"] += 1
                return real(state, batch)

            return step

        monkeypatch.setattr(trainer_mod, "make_train_step", failing_make)
        served_fail = []
        with pytest.raises(RuntimeError, match="injected"):
            train(self._cfg(tmp_path / "c", 3),
                  self._make_loader(tmp_path, served_fail))
        assert glob.glob(str(tmp_path / "c" / "loader_state-1-*.bin")), (
            "emergency checkpoint did not save a loader sidecar"
        )

        monkeypatch.setattr(trainer_mod, "make_train_step", real_make)
        served_resume = []
        state = train(self._cfg(tmp_path / "c", 3),
                      self._make_loader(tmp_path, served_resume))
        assert int(state.step) == 3
        # two pre-restore fetches, then the restored order: batch 1 (the
        # failed step's, replayed), batch 2, and batch 3 (prefetch)
        assert served_resume[2:] == served_a[1:4]


class TestDivergenceAbort:
    def test_trainer_aborts_on_persistent_divergence(self, tmp_path):
        """Persistent NaN gradients must abort with RuntimeError after
        max_consecutive_nonfinite consecutive skipped steps, checkpointing
        the still-finite state — not poison the params (old optax give-up
        behavior) and not silently no-op to the end of the budget."""
        import glob

        from anystereo_tpu.config import Config
        from anystereo_tpu.train.trainer import train

        b, h, w, q = 1, 32, 64, 64
        rng = np.random.RandomState(0)

        def make_batch(poison: bool):
            left = rng.rand(b, h, w, 3).astype(np.float32) * 255
            if poison:
                left = np.full_like(left, np.nan)
            return {
                "left": left,
                "right": rng.rand(b, h, w, 3).astype(np.float32) * 255,
                "coords": (rng.rand(b, q, 2).astype(np.float32) * 2 - 1)
                * 0.99,
                "gt": rng.rand(b, q).astype(np.float32) * 20,
                "valid": np.ones((b, q), np.float32),
                "scale": np.ones((b,), np.float32),
            }

        def loader():
            yield make_batch(poison=False)  # init + one good step
            while True:
                yield make_batch(poison=True)

        cfg = Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=2,
                batch_size=1,
                lr=1e-4,
                num_steps=100,
                ckpt_every=1000,
                ckpt_dir=str(tmp_path / "ckpt"),
                max_consecutive_nonfinite=3,
            ),
        )
        with pytest.raises(RuntimeError, match="diverged"):
            train(cfg, loader())
        steps = [
            p
            for p in glob.glob(str(tmp_path / "ckpt" / "*"))
            if p.rsplit("/", 1)[-1].isdigit()
        ]
        assert steps, "divergence abort did not save a checkpoint"
        # the saved params are the guard-protected (finite) ones
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(str(tmp_path / "ckpt"))
        restored = mngr.restore(
            mngr.latest_step(),
            args=ocp.args.Composite(params=ocp.args.StandardRestore()),
        )["params"]
        mngr.close()
        finite = all(
            bool(np.isfinite(np.asarray(x)).all())
            for x in jax.tree_util.tree_leaves(restored)
        )
        assert finite, "checkpointed params contain nonfinite values"


class TestStepDecay:
    def test_step_decay_schedule(self):
        from anystereo_tpu.train.optimizer import step_decay_schedule

        sched = step_decay_schedule(1e-3, milestones=[10, 20], gamma=0.5)
        assert float(sched(5)) == pytest.approx(1e-3)
        assert float(sched(15)) == pytest.approx(5e-4)
        assert float(sched(25)) == pytest.approx(2.5e-4)
