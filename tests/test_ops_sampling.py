"""Golden tests for sampling primitives against torch (CPU) as an
independent oracle for grid_sample / interpolate / avg_pool semantics.
The reference's live lookup path is F.grid_sample
(models/coreContinuous_IGEV/geometry.py:47,54, utils/utils.py:59-73)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from anystereo_tpu.ops.sampling import (
    avg_pool2d,
    gather_1d_linear,
    interp_bilinear,
    nearest_latent_coords,
    nearest_resize,
    nearest_sample,
    pool_half_last,
    global_avg_pool,
)


def torch_bilinear_sampler_1d(vol_np, pos_np):
    """The reference bilinear_sampler (utils/utils.py:59-73) applied to
    [N, C, 1, L] rows at pixel positions [N, 1, K]."""
    n, c, _, L = vol_np.shape
    img = torch.from_numpy(vol_np)
    x = torch.from_numpy(pos_np)[:, None, :, None]  # [N,1,K,1]
    xgrid = 2 * x / (L - 1) - 1
    grid = torch.cat([xgrid, torch.zeros_like(xgrid)], dim=-1)
    out = TF.grid_sample(img, grid, align_corners=True, mode="bilinear")
    return out.numpy()  # [N, C, 1, K]


class TestGather1dLinear:
    def test_matches_reference_grid_sample(self, rng):
        n, c, L, K = 6, 8, 48, 9
        vol = rng.randn(n, c, 1, L).astype(np.float32)
        # positions spanning in-bounds, fractional, and out-of-bounds
        pos = (rng.rand(n, K).astype(np.float32) * (L + 10)) - 5
        want = torch_bilinear_sampler_1d(vol, pos)[:, :, 0, :]  # [N,C,K]

        vol_j = jnp.asarray(vol[:, :, 0, :])  # [N, C, L]
        pos_j = jnp.broadcast_to(jnp.asarray(pos)[:, None, :], (n, c, K))
        got = np.asarray(gather_1d_linear(vol_j, pos_j))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_integer_positions_are_exact(self, rng):
        vol = jnp.asarray(rng.randn(2, 16).astype(np.float32))
        pos = jnp.asarray([[0.0, 3.0, 15.0], [1.0, 2.0, 14.0]])
        got = gather_1d_linear(vol, pos)
        want = np.stack(
            [np.asarray(vol)[0, [0, 3, 15]], np.asarray(vol)[1, [1, 2, 14]]]
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_out_of_bounds_is_zero(self):
        vol = jnp.ones((1, 8))
        pos = jnp.asarray([[-2.0, -1.0, 8.0, 100.0]])
        got = np.asarray(gather_1d_linear(vol, pos))
        np.testing.assert_allclose(got, np.zeros((1, 4)))

    def test_edge_taps_partial(self):
        # at pos = -0.5 the left tap is OOB: value = 0.5 * vol[0]
        vol = jnp.asarray([[2.0, 4.0, 6.0]])
        got = np.asarray(gather_1d_linear(vol, jnp.asarray([[-0.5, 2.5]])))
        np.testing.assert_allclose(got, [[1.0, 3.0]])


class TestNearestSample:
    def test_matches_torch_grid_sample_nearest(self, rng):
        b, h, w, c, q = 2, 7, 13, 5, 40
        feat = rng.randn(b, h, w, c).astype(np.float32)
        coords = (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * (1 - 1e-6)

        feat_t = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
        # torch grid expects (x, y) order; ours is (y, x)
        grid = torch.from_numpy(coords[..., ::-1].copy())[:, None]  # [B,1,Q,2]
        want = (
            TF.grid_sample(feat_t, grid, mode="nearest", align_corners=False)[
                :, :, 0, :
            ]
            .permute(0, 2, 1)
            .numpy()
        )
        got = np.asarray(nearest_sample(jnp.asarray(feat), jnp.asarray(coords)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_latent_coords_match_sampling_coord_grid(self, rng):
        """nearest_latent_coords must equal nearest-sampling a make_coord
        grid, the reference's q_coord (liif.py:124-125)."""
        from anystereo_tpu.ops.coords import make_coord_grid

        b, h, w, q = 2, 5, 9, 30
        coords = jnp.asarray(
            (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * (1 - 1e-6)
        )
        grid = jnp.broadcast_to(
            jnp.transpose(make_coord_grid(h, w), (1, 2, 0))[None], (b, h, w, 2)
        )
        want = nearest_sample(grid, coords)
        got = nearest_latent_coords(coords, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestResize:
    def test_bilinear_align_corners_matches_torch(self, rng):
        x = rng.randn(2, 10, 23, 4).astype(np.float32)
        want = (
            TF.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=(20, 46),
                mode="bilinear",
                align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(interp_bilinear(jnp.asarray(x), (20, 46)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_nearest_matches_torch(self, rng):
        x = rng.randn(1, 8, 12, 3).astype(np.float32)
        want = (
            TF.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=(31, 17), mode="nearest"
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(nearest_resize(jnp.asarray(x), (31, 17)))
        np.testing.assert_allclose(got, want)


class TestPooling:
    def test_avg_pool_3x3_s2_p1_matches_torch(self, rng):
        """pool2x (update.py:94-95): count_include_pad=True semantics."""
        x = rng.randn(2, 9, 15, 6).astype(np.float32)
        want = (
            TF.avg_pool2d(
                torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=2, padding=1
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(avg_pool2d(jnp.asarray(x), 3, 2, 1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_pool_half_last_matches_torch_1x2(self, rng):
        """pyramid pooling (geometry.py:24): F.avg_pool2d([1,2], stride [1,2])."""
        x = rng.randn(4, 3, 1, 47).astype(np.float32)  # odd length → floor
        want = TF.avg_pool2d(torch.from_numpy(x), [1, 2], stride=[1, 2]).numpy()
        got = np.asarray(pool_half_last(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_global_avg_pool(self, rng):
        x = rng.randn(2, 5, 7, 3).astype(np.float32)
        got = np.asarray(global_avg_pool(jnp.asarray(x)))
        np.testing.assert_allclose(got[:, 0, 0], x.mean(axis=(1, 2)), rtol=1e-5)
