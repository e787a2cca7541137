"""End-to-end trainer-loop test: synthetic data → train() for a few steps
with checkpointing and a validation callback (the reference's train(args)
shape, train_continuous_IGEV.py:183-281)."""

import os

import numpy as np
import pytest

import jax

from anystereo_tpu.config import Config, ModelConfig, TrainConfig
from anystereo_tpu.train.trainer import train


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class _SyntheticLoader:
    def __init__(self, b=1, h=32, w=64, q=64, n=100):
        self.b, self.h, self.w, self.q, self.n = b, h, w, q, n

    def __iter__(self):
        rng = np.random.RandomState(0)
        b, h, w, q = self.b, self.h, self.w, self.q
        for _ in range(self.n):
            yield {
                "left": rng.rand(b, h, w, 3).astype(np.float32) * 255,
                "right": rng.rand(b, h, w, 3).astype(np.float32) * 255,
                "coords": (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99,
                "gt": rng.rand(b, q).astype(np.float32) * 20,
                "valid": np.ones((b, q), np.float32),
                "scale": np.ones((b,), np.float32),
                "gt_low": rng.rand(b, h // 4, w // 4).astype(np.float32) * 5,
            }


class TestTrainerLoop:
    def test_train_runs_checkpoints_and_validates(self, tmp_path):
        cfg = Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=1,
                batch_size=1,
                lr=1e-4,
                num_steps=3,
                ckpt_every=3,
                ckpt_dir=str(tmp_path / "ckpt"),
                supervise_init=True,
            ),
        )
        calls = []

        def validate_fn(state, step):
            calls.append(step)
            return {"epe": 1.0}

        state = train(cfg, _SyntheticLoader(), validate_fn=validate_fn, max_steps=3)
        assert int(state.step) == 3
        assert calls == [3]
        # full-state checkpoint exists
        assert any(os.scandir(tmp_path / "ckpt"))

    def test_auto_resume_continues_schedule(self, tmp_path):
        """Resume picks up step count AND optimizer state (unlike the
        reference's weights-only restore)."""
        cfg = Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=1, batch_size=1, lr=1e-4, num_steps=4,
                ckpt_every=2, ckpt_dir=str(tmp_path / "ckpt"),
            ),
        )
        s1 = train(cfg, _SyntheticLoader(), max_steps=2)
        assert int(s1.step) == 2
        s2 = train(cfg, _SyntheticLoader(), max_steps=4)  # resumes at 2
        assert int(s2.step) == 4

    def test_warm_start_loads_weights_fresh_schedule(self, tmp_path):
        """The reference's --restore_ckpt fine-tune flow
        (train_continuous_IGEV.py:192-200): weights come from a previous
        run's checkpoint, the step counter and optimizer start fresh."""
        cfg1 = Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=1, batch_size=1, lr=1e-4, num_steps=2,
                ckpt_every=2, ckpt_dir=str(tmp_path / "pretrain"),
            ),
        )
        s1 = train(cfg1, _SyntheticLoader(), max_steps=2)
        assert int(s1.step) == 2

        # different seed: a cold init would differ from the donor by O(0.1),
        # so post-step closeness below discriminates loaded vs not-loaded
        cfg2 = Config(
            model=ModelConfig(max_disp=32),
            train=TrainConfig(
                train_iters=1, batch_size=1, lr=1e-4, num_steps=2,
                ckpt_every=2, ckpt_dir=str(tmp_path / "finetune"), seed=999,
            ),
        )
        s2 = train(
            cfg2,
            _SyntheticLoader(),
            max_steps=1,
            warm_start=str(tmp_path / "pretrain"),
        )
        # fresh schedule: one step taken from step 0, not resumed at 2
        assert int(s2.step) == 1
        # weights came from the donor: one lr=1e-4 step moves params ~1e-4,
        # while a (seed-999) cold init differs from the donor by O(0.1)
        from anystereo_tpu.train.state import restore_params_only

        donor = restore_params_only(str(tmp_path / "pretrain"), s2.params)
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree_util.tree_leaves(donor),
                jax.tree_util.tree_leaves(s2.params),
            )
        ]
        assert max(diffs) < 0.01, "warm-started params diverged: not loaded?"


class TestFrozenBatchRegime:
    def test_trains_and_checkpoints_batch_stats(self, tmp_path):
        """Reference-regime (FROZEN_BATCH) models carry a batch_stats
        collection: the trainer must thread it through apply, the
        checkpoint must round-trip it, and resume must restore it (the
        running statistics come from converted torch backbones and are
        never updated)."""
        from anystereo_tpu.config import NormType
        from anystereo_tpu.train.state import restore_checkpoint

        cfg = Config(
            model=ModelConfig(max_disp=32, norm_2d=NormType.FROZEN_BATCH),
            train=TrainConfig(
                train_iters=1, batch_size=1, lr=1e-4, num_steps=2,
                ckpt_every=2, ckpt_dir=str(tmp_path / "ckpt"),
            ),
        )
        state = train(cfg, _SyntheticLoader(n=4), max_steps=2)
        assert state.batch_stats is not None
        leaves = jax.tree_util.tree_leaves(state.batch_stats)
        assert leaves, "frozen-BN model produced empty batch_stats"

        # round-trip through the checkpoint into a fresh state
        import optax

        fresh = state.replace(
            step=state.step * 0,
            batch_stats=jax.tree_util.tree_map(
                lambda x: np.zeros_like(x), state.batch_stats
            ),
        )
        restored = restore_checkpoint(cfg.train.ckpt_dir, fresh)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.batch_stats), leaves
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
