"""Golden tests for cost-volume construction, the pyramid lookup, and the
context-upsample family against torch oracles reproducing the reference's
exact formulas (submodule.py:253-398, geometry.py:6-72)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from anystereo_tpu.ops.coords import make_coord
from anystereo_tpu.ops.cost_volume import (
    all_pairs_correlation,
    build_gwc_volume,
    build_gwc_volume_unrolled,
    disparity_regression,
)
from anystereo_tpu.ops.lookup import (
    build_pyramid,
    internal_to_reference_perm,
    pyramid_lookup,
)
from anystereo_tpu.ops.upsample import (
    context_upsample_queries,
    unfold3x3,
)


def torch_gwc_volume(fl, fr, maxdisp, groups):
    """Reference build_gwc_volume (submodule.py:261-271), NCHW."""
    B, C, H, W = fl.shape
    cg = C // groups
    vol = torch.zeros(B, groups, maxdisp, H, W)
    for i in range(maxdisp):
        if i > 0:
            prod = fl[:, :, :, i:] * fr[:, :, :, :-i]
            vol[:, :, i, :, i:] = prod.view(B, groups, cg, H, W - i).mean(2)
        else:
            vol[:, :, i] = (fl * fr).view(B, groups, cg, H, W).mean(2)
    return vol


class TestCostVolumes:
    def test_all_pairs_matches_einsum(self, rng):
        b, h, w, c = 2, 5, 12, 16
        fl = rng.randn(b, h, w, c).astype(np.float32)
        fr = rng.randn(b, h, w, c).astype(np.float32)
        # reference: einsum('aijk,aijh->ajkh') on [B,C,H,W] (geometry.py:70)
        want = torch.einsum(
            "aijk,aijh->ajkh",
            torch.from_numpy(fl).permute(0, 3, 1, 2),
            torch.from_numpy(fr).permute(0, 3, 1, 2),
        ).numpy()
        got = np.asarray(all_pairs_correlation(jnp.asarray(fl), jnp.asarray(fr)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_gwc_volume_matches_reference(self, rng):
        b, h, w, c, d, g = 2, 4, 10, 16, 6, 4
        fl = rng.randn(b, h, w, c).astype(np.float32)
        fr = rng.randn(b, h, w, c).astype(np.float32)
        want = torch_gwc_volume(
            torch.from_numpy(fl).permute(0, 3, 1, 2),
            torch.from_numpy(fr).permute(0, 3, 1, 2),
            d,
            g,
        ).numpy()  # [B,G,D,H,W]
        got = np.asarray(build_gwc_volume(jnp.asarray(fl), jnp.asarray(fr), d, g))
        got_nchw = np.transpose(got, (0, 3, 4, 1, 2))  # [B,H,W,G,D]→[B,G,D,H,W]
        np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)

    def test_gwc_scan_matches_unrolled(self, rng):
        b, h, w, c, d, g = 1, 3, 9, 8, 5, 2
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        a = np.asarray(build_gwc_volume(fl, fr, d, g))
        bb = np.asarray(build_gwc_volume_unrolled(fl, fr, d, g))
        np.testing.assert_allclose(a, bb, rtol=1e-5, atol=1e-6)

    def test_disparity_regression(self, rng):
        logits = rng.randn(2, 3, 5, 8).astype(np.float32)
        prob = np.asarray(jnp.asarray(logits))
        prob = np.exp(prob) / np.exp(prob).sum(-1, keepdims=True)
        got = np.asarray(disparity_regression(jnp.asarray(prob), 8))
        want = (prob * np.arange(8)).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def torch_combined_lookup(fl, fr, geo, disp, radius, levels):
    """Reference Combined_Geo_Encoding_Volume build+call (geometry.py:6-60),
    re-expressed with explicit grid_sample calls. NCHW inputs."""
    B, C, H, W = fl.shape
    corr = torch.einsum("aijk,aijh->ajkh", fl, fr).reshape(B * H * W, 1, 1, W)
    b, c8, D = geo.shape[0], geo.shape[1], geo.shape[2]
    geo_r = geo.permute(0, 3, 4, 1, 2).reshape(B * H * W, c8, 1, D)
    geo_pyr, corr_pyr = [geo_r], [corr]
    for _ in range(levels - 1):
        geo_pyr.append(TF.avg_pool2d(geo_pyr[-1], [1, 2], stride=[1, 2]))
        corr_pyr.append(TF.avg_pool2d(corr_pyr[-1], [1, 2], stride=[1, 2]))

    def sample(vol, pos):
        L = vol.shape[-1]
        xg = 2 * pos / (L - 1) - 1
        grid = torch.cat([xg, torch.zeros_like(xg)], dim=-1)
        return TF.grid_sample(vol, grid, align_corners=True)

    coords = torch.arange(W).float().reshape(1, 1, W, 1).repeat(B, H, 1, 1)
    dx = torch.linspace(-radius, radius, 2 * radius + 1).view(1, 1, -1, 1)
    out = []
    for i in range(levels):
        x0 = dx + disp.reshape(B * H * W, 1, 1, 1) / 2**i
        g = sample(geo_pyr[i], x0).view(B, H, W, -1)
        ix0 = coords.reshape(B * H * W, 1, 1, 1) / 2**i - disp.reshape(
            B * H * W, 1, 1, 1
        ) / 2**i + dx
        c = sample(corr_pyr[i], ix0).view(B, H, W, -1)
        out.append(g)
        out.append(c)
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2)  # [B, C_lookup, H, W]


class TestPyramidLookup:
    def test_igev_lookup_matches_reference(self, rng):
        b, h, w, c, g, d, r, levels = 1, 4, 16, 8, 2, 8, 2, 2
        fl = rng.randn(b, h, w, c).astype(np.float32)
        fr = rng.randn(b, h, w, c).astype(np.float32)
        geo = rng.randn(b, h, w, g, d).astype(np.float32)
        disp = (rng.rand(b, h, w).astype(np.float32)) * (d - 1)

        want = torch_combined_lookup(
            torch.from_numpy(fl).permute(0, 3, 1, 2),
            torch.from_numpy(fr).permute(0, 3, 1, 2),
            torch.from_numpy(geo).permute(0, 3, 4, 1, 2),  # [B,G,D,H,W]
            torch.from_numpy(disp)[:, None],
            r,
            levels,
        ).numpy()  # [B, C, H, W]

        corr = all_pairs_correlation(jnp.asarray(fl), jnp.asarray(fr))
        pyr = build_pyramid(corr, jnp.asarray(geo), levels, r)
        got = np.asarray(pyramid_lookup(pyr, jnp.asarray(disp)))
        # internal channel order -> reference order (ops/lookup.py docstring)
        perm = internal_to_reference_perm(levels, r, g)
        got_ref_order = np.empty_like(got)
        got_ref_order[..., perm] = got
        got_nchw = np.transpose(got_ref_order, (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-4)
        assert got.shape[-1] == levels * (2 * r + 1) * (g + 1)

    def test_split_and_out_dtype_match_concat(self, rng):
        """pyramid_lookup(split=True) parts concatenated must equal the
        fused output, per impl; out_dtype=bf16 must equal astype(bf16) of
        the fp32 result (rounding at the same point)."""
        from anystereo_tpu.ops.lookup import set_impl_override

        b, h, w, c, g, d = 1, 3, 10, 8, 4, 8
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        geo = jnp.asarray(rng.randn(b, h, w, g, d).astype(np.float32))
        corr = all_pairs_correlation(fl, fr)
        pyr = build_pyramid(corr, geo, num_levels=2, radius=2)
        disp = jnp.asarray(rng.rand(b, h, w).astype(np.float32) * d)
        for impl, interp in (("jnp", False), ("pallas", True)):
            set_impl_override(impl, interpret=interp)
            try:
                full = pyramid_lookup(pyr, disp)
                parts = pyramid_lookup(pyr, disp, split=True)
                bf = pyramid_lookup(
                    pyr, disp, split=True, out_dtype=jnp.bfloat16
                )
            finally:
                set_impl_override(None)
            assert isinstance(parts, tuple) and len(parts) == 2
            np.testing.assert_array_equal(
                np.asarray(jnp.concatenate(parts, axis=-1)), np.asarray(full)
            )
            assert all(p.dtype == jnp.bfloat16 for p in bf)
            np.testing.assert_array_equal(
                np.asarray(jnp.concatenate(bf, axis=-1), np.float32),
                np.asarray(full.astype(jnp.bfloat16), np.float32),
            )

    def test_raft_lookup_channels(self, rng):
        b, h, w, c = 1, 3, 12, 8
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        corr = all_pairs_correlation(fl, fr)
        pyr = build_pyramid(corr, None, num_levels=4, radius=4)
        disp = jnp.zeros((b, h, w))
        out = pyramid_lookup(pyr, disp)
        assert out.shape == (b, h, w, 4 * 9)

    def test_zero_disp_lookup_center_tap_is_self_corr(self, rng):
        """At disp=0, the center corr tap at level 0 must be corr[w, w]."""
        b, h, w, c = 1, 2, 10, 4
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        corr = all_pairs_correlation(fl, fr)
        pyr = build_pyramid(corr, None, num_levels=1, radius=1)
        out = pyramid_lookup(pyr, jnp.zeros((b, h, w)))  # taps dx=-1,0,1
        want = np.asarray(corr)[0, :, np.arange(w), np.arange(w)]
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 1], want.T, rtol=1e-5)


class TestContextUpsample:
    def test_unfold3x3_matches_torch(self, rng):
        x = rng.randn(2, 5, 7).astype(np.float32)
        want = (
            TF.unfold(torch.from_numpy(x)[:, None], 3, padding=1)
            .reshape(2, 9, 5, 7)
            .numpy()
        )
        got = np.transpose(np.asarray(unfold3x3(jnp.asarray(x))), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want)

    def test_queries_match_reference(self, rng):
        """context_upsample_multiscale_train (submodule.py:357-372)."""
        b, h, w, q = 2, 6, 8, 25
        disp = rng.randn(b, h, w).astype(np.float32)
        weights = rng.rand(b, q, 9).astype(np.float32)
        coords = (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.999

        # torch oracle
        dt = torch.from_numpy(disp)[:, None]
        hr = torch.from_numpy(coords.copy())
        hr.clamp_(-1 + 1e-6, 1 - 1e-6)
        hr_flipped = hr.flip(-1).unsqueeze(1)
        unfolded = TF.unfold(dt, 3, padding=1).reshape(b, 9, h, w)
        taps = TF.grid_sample(
            unfolded, hr_flipped, mode="nearest", align_corners=False
        )[:, :, 0, :]
        want = (taps * torch.from_numpy(weights).permute(0, 2, 1)).sum(1).numpy()

        got = np.asarray(
            context_upsample_queries(
                jnp.asarray(disp), jnp.asarray(weights), jnp.asarray(coords)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCoords:
    def test_make_coord_matches_reference(self):
        """liif.py:32-45 formula: centers at v0 + r + 2r*i."""
        got = np.asarray(make_coord((4, 6)))
        seq_y = -1 + 1 / 4 + (2 / 4) * np.arange(4)
        seq_x = -1 + 1 / 6 + (2 / 6) * np.arange(6)
        want = np.stack(np.meshgrid(seq_y, seq_x, indexing="ij"), -1).reshape(-1, 2)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestFusedGwcCorr:
    """build_gwc_and_corr: the grouped-matmul + banded-extraction build
    must match the shift-multiply scan (itself torch-oracle-tested) and
    the HIGHEST-precision all-pairs einsum."""

    @pytest.mark.parametrize(
        "b,h,w,c,g,d", [(2, 8, 40, 32, 8, 16), (1, 4, 16, 24, 4, 16),
                        (1, 5, 48, 64, 8, 48)]
    )
    def test_matches_scan_and_allpairs(self, b, h, w, c, g, d):
        from anystereo_tpu.ops.cost_volume import (
            all_pairs_correlation,
            build_gwc_and_corr,
            build_gwc_volume,
        )

        rng = np.random.RandomState(7)
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        gwc, corr = build_gwc_and_corr(fl, fr, d, g)
        np.testing.assert_allclose(
            np.asarray(gwc), np.asarray(build_gwc_volume(fl, fr, d, g)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(corr), np.asarray(all_pairs_correlation(fl, fr)),
            rtol=1e-4, atol=1e-4,
        )

    def test_fallback_when_disp_exceeds_width(self):
        """max_disp > W (toy shapes) takes the scan path; values and the
        zero triangle are identical."""
        from anystereo_tpu.ops.cost_volume import (
            build_gwc_and_corr,
            build_gwc_volume_unrolled,
        )

        rng = np.random.RandomState(3)
        fl = jnp.asarray(rng.randn(1, 3, 10, 8).astype(np.float32))
        fr = jnp.asarray(rng.randn(1, 3, 10, 8).astype(np.float32))
        gwc, _ = build_gwc_and_corr(fl, fr, 12, 2)
        want = build_gwc_volume_unrolled(fl, fr, 12, 2)
        np.testing.assert_allclose(np.asarray(gwc), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_zero_triangle_exact(self):
        from anystereo_tpu.ops.cost_volume import build_gwc_and_corr

        rng = np.random.RandomState(1)
        fl = jnp.asarray(rng.randn(1, 2, 32, 16).astype(np.float32))
        fr = jnp.asarray(rng.randn(1, 2, 32, 16).astype(np.float32))
        gwc, _ = build_gwc_and_corr(fl, fr, 8, 4)
        gwc = np.asarray(gwc)
        for w_i in range(32):
            for d_i in range(8):
                if w_i < d_i:
                    assert (gwc[:, :, w_i, :, d_i] == 0).all()
