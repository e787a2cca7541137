"""Dense-decode parity: the gather-free separable decode must equal the
query-based decode evaluated on the same grid (same math, different
lowering), and the dense validator grid must match pad_for_queries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import ModelConfig
from anystereo_tpu.eval.validate import pad_for_dense_grid, pad_for_queries
from anystereo_tpu.nn.model import AnyStereo, dense_query_coords
from anystereo_tpu.ops.coords import _axis_centers


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestDenseDecodeParity:
    def test_matches_query_decode_on_grid(self):
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        b, h, w = 1, 32, 64
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = dense_query_coords(b, h, w)
        scale = jnp.asarray([1.5], jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, coords=coords, scale=scale
        )
        q_out = model.apply(
            variables, left, right, iters=2, coords=coords, scale=scale, mode="eval"
        ).disp_final  # [B, H*W]
        d_out = model.apply(
            variables, left, right, iters=2,
            dense_grid=(_axis_centers(h), _axis_centers(w)), scale=scale,
            mode="eval",
        ).disp_final  # [B, H, W]
        np.testing.assert_allclose(
            np.asarray(d_out).reshape(b, -1), np.asarray(q_out), rtol=1e-4,
            atol=1e-4,
        )

    @pytest.mark.parametrize("kw", [
        dict(liif=dict(quarter_nearest="both")),
        dict(liif=dict(local_ensemble=True)),
        dict(liif=dict(quarter_nearest="both", local_ensemble=True)),
    ])
    def test_quarter_and_ensemble_match_query_decode(self, kw):
        """Round-5: quarter_nearest / local_ensemble previously fell back
        to the per-query gather path at eval; the separable dense decode
        now covers them and must match the query path on the same grid."""
        from anystereo_tpu.config import LiifConfig

        cfg = ModelConfig(max_disp=32, liif=LiifConfig(**kw["liif"]))
        model = AnyStereo(cfg)
        b, h, w = 1, 32, 64
        rng = np.random.RandomState(2)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = dense_query_coords(b, h, w)
        scale = jnp.asarray([1.5], jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, coords=coords,
            scale=scale,
        )
        q_out = model.apply(
            variables, left, right, iters=2, coords=coords, scale=scale,
            mode="eval",
        ).disp_final  # [B, H*W]
        d_out = model.apply(
            variables, left, right, iters=2,
            dense_grid=(_axis_centers(h), _axis_centers(w)), scale=scale,
            mode="eval",
        ).disp_final  # [B, H, W]
        np.testing.assert_allclose(
            np.asarray(d_out).reshape(b, -1), np.asarray(q_out), rtol=1e-4,
            atol=1e-4,
        )

    def test_eval_default_is_dense_full_grid(self):
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        b, h, w = 1, 32, 64
        rng = np.random.RandomState(1)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, mode="eval"
        )
        out = model.apply(variables, left, right, iters=1, mode="eval")
        assert out.disp_final.shape == (b, h, w)

    def test_train_mode_rejects_dense_grid(self):
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        left = jnp.zeros((1, 32, 64, 3))
        with pytest.raises(ValueError):
            model.init(
                jax.random.PRNGKey(0), left, left, iters=1,
                dense_grid=(_axis_centers(32), _axis_centers(64)), mode="train",
            )


class TestDenseGridBookkeeping:
    @pytest.mark.parametrize("scale_test", [1.0, 2.0])
    def test_outer_product_matches_pad_for_queries(self, scale_test):
        h, w = 30, 50
        left = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
        _, _, coords, _ = pad_for_queries(left, left.copy(), scale_test, 16)
        _, _, ys, xs, _ = pad_for_dense_grid(left, left.copy(), scale_test, 16)
        grid = np.stack(
            np.meshgrid(np.asarray(ys), np.asarray(xs), indexing="ij"), axis=-1
        ).reshape(1, -1, 2)
        np.testing.assert_allclose(grid, np.asarray(coords), atol=1e-5)


class TestDecoderInputDim:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(pos_enc="sinusoid", pos_dim=0),   # encoder still emits 8ch
        dict(pos_enc="ipe", pos_dim=16),
        dict(pos_enc="spatial", pos_dim=24),
        dict(decode_cell=True),
        dict(quarter_nearest="both"),
    ])
    def test_matches_built_mlp_width(self, kw):
        """decoder_input_dim (the liif.py:597-642 bookkeeping twin) must
        agree with the width flax actually builds for the decoder MLP."""
        import jax
        import numpy as np

        from anystereo_tpu.config import LiifConfig
        from anystereo_tpu.nn.liif import LiifDecoder, decoder_input_dim

        cfg = LiifConfig(**kw)
        dec = LiifDecoder(cfg)
        rng = np.random.RandomState(0)
        feats = [
            jnp.asarray(rng.rand(1, 16, 24, 12).astype(np.float32)),
            jnp.asarray(rng.rand(1, 8, 12, 20).astype(np.float32)),
        ]
        coords = jnp.asarray(
            (rng.rand(1, 32, 2).astype(np.float32) * 2 - 1) * 0.9
        )
        scale = jnp.asarray([1.5], np.float32)
        variables = dec.init(
            jax.random.PRNGKey(0), feats, coords=coords, scale=scale
        )
        built = variables["params"]["imnet"]["Dense_0"]["kernel"].shape[0]
        want = decoder_input_dim(cfg, [12, 20])
        assert built == want, (built, want)
