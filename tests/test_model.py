"""End-to-end model shape/sanity tests for both cores (tiny configs).

Mirrors SURVEY.md §2 shape tables: matching features at 1/4, GWC volume
[B, H/4, W/4, G, D], lookup width 162 (IGEV, levels 2 r 4) / 36 (RAFT,
levels 4 r 4), LIIF weights [B, Q, 9]."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import LiifConfig, ModelConfig, raft_config
from anystereo_tpu.nn.model import AnyStereo, dense_query_coords


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


def tiny_igev(**kw):
    base = dict(max_disp=32, corr_levels=2, corr_radius=4)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def igev_setup():
    cfg = tiny_igev()
    model = AnyStereo(cfg)
    b, h, w = 1, 64, 96
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    q = 128
    coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99)
    scale = jnp.asarray([1.5], np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), left, right, iters=1, coords=coords, scale=scale
    )
    return model, variables, left, right, coords, scale


class TestIgevCore:
    def test_train_mode_shapes(self, igev_setup):
        model, variables, left, right, coords, scale = igev_setup
        out = model.apply(
            variables, left, right, iters=2, coords=coords, scale=scale, mode="train"
        )
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        assert out.init_disp.shape == (b, h // 4, w // 4)
        assert out.disp_preds.shape == (2, b, coords.shape[1])
        assert out.disp_final.shape == (b, coords.shape[1])
        assert out.disp_lowres.shape == (b, h // 4, w // 4)
        for arr in (out.init_disp, out.disp_preds, out.disp_final):
            assert arr.dtype == jnp.float32
            assert bool(jnp.isfinite(arr).all())

    def test_eval_mode_shapes(self, igev_setup):
        model, variables, left, right, coords, scale = igev_setup
        out = model.apply(
            variables, left, right, iters=3, coords=coords, scale=scale, mode="eval"
        )
        assert out.disp_preds is None
        assert out.disp_final.shape == (left.shape[0], coords.shape[1])
        assert bool(jnp.isfinite(out.disp_final).all())

    def test_init_disp_in_range(self, igev_setup):
        """Softargmin output must lie in [0, D-1] (submodule.py:321-325)."""
        model, variables, left, right, coords, scale = igev_setup
        out = model.apply(
            variables, left, right, iters=1, coords=coords, scale=scale, mode="train"
        )
        d = 32 // 4
        assert float(out.init_disp.min()) >= 0.0
        assert float(out.init_disp.max()) <= d - 1

    def test_grads_flow(self, igev_setup):
        model, variables, left, right, coords, scale = igev_setup

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                left,
                right,
                iters=2,
                coords=coords,
                scale=scale,
                mode="train",
            )
            return jnp.abs(out.disp_preds).mean() + jnp.abs(out.init_disp).mean()

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in flat)
        # the GRU path must receive gradient (update block convs)
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0


class TestRaftCore:
    def test_forward_shapes(self):
        cfg = raft_config(max_disp=32)
        model = AnyStereo(cfg)
        b, h, w = 1, 32, 64
        rng = np.random.RandomState(1)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = dense_query_coords(b, h, w)
        variables = model.init(jax.random.PRNGKey(0), left, right, iters=1)
        out = model.apply(variables, left, right, iters=2, mode="train")
        assert out.init_disp is None
        assert out.disp_preds.shape == (2, b, h * w)
        assert out.disp_lowres.shape == (b, h // 4, w // 4)

    def test_lookup_width_raft(self):
        from anystereo_tpu.config import CoreType

        cfg = raft_config()
        assert cfg.lookup_channels == 4 * 9
        assert ModelConfig().lookup_channels == 2 * 9 * 9  # 162 (update.py:77)


class TestRemat:
    def test_remat_grads_match_no_remat(self, igev_setup):
        """jax.checkpoint over the GRU scan must not change gradients."""
        model, variables, left, right, coords, scale = igev_setup
        from anystereo_tpu.config import ModelConfig
        import dataclasses

        cfg_r = dataclasses.replace(model.cfg, remat=True)
        model_r = AnyStereo(cfg_r)

        def loss(mdl, params):
            out = mdl.apply(
                {"params": params}, left, right, iters=2, coords=coords,
                scale=scale, mode="train",
            )
            return jnp.abs(out.disp_preds).mean()

        g0 = jax.grad(lambda p: loss(model, p))(variables["params"])
        g1 = jax.grad(lambda p: loss(model_r, p))(variables["params"])
        a = np.concatenate(
            [np.asarray(x, np.float32).ravel()
             for x in jax.tree_util.tree_leaves(g0)]
        )
        b = np.concatenate(
            [np.asarray(x, np.float32).ravel()
             for x in jax.tree_util.tree_leaves(g1)]
        )
        # bf16 recompute reorders accumulations; require global agreement
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        assert rel < 0.02, rel
