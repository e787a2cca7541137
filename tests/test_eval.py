"""Metric-suite tests: exact reference semantics (metrics_utils/metrics.py)
on hand-computed cases, padder round-trip incl. the fixed get_pad_num, and
LR-consistency occlusion."""

import numpy as np
import pytest

import jax.numpy as jnp

from anystereo_tpu.eval.metrics import (
    AverageMeterDict,
    compute_metrics,
    d1_metric,
    epe_metric,
    thres_metric,
)
from anystereo_tpu.eval.occlusion import occ_mask, warp_disparity
from anystereo_tpu.eval.padder import InputPadder


class TestMetrics:
    def test_epe_simple(self):
        pred = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
        gt = jnp.asarray([[[1.0, 4.0], [3.0, 8.0]]])
        mask = jnp.ones((1, 2, 2), bool)
        assert float(epe_metric(pred, gt, mask)) == pytest.approx((0 + 2 + 0 + 4) / 4)

    def test_epe_per_image_average(self):
        """Per-image averaging (make_iterative_func, metrics.py:22-30):
        images are weighted equally regardless of valid-pixel count."""
        pred = jnp.asarray([[[0.0, 0.0]], [[0.0, 0.0]]])
        gt = jnp.asarray([[[2.0, 2.0]], [[8.0, 100.0]]])
        mask = jnp.asarray([[[True, True]], [[True, False]]])
        # image0: epe 2; image1: epe 8 (only first pixel) → mean 5
        assert float(epe_metric(pred, gt, mask)) == pytest.approx(5.0)

    def test_d1_needs_both_conditions(self):
        gt = jnp.asarray([[[100.0, 1.0, 100.0]]])
        # err 4 (>3, 4% of 100: NOT >5%) | err 2 (<=3) | err 6 (>3 and 6%)
        pred = gt + jnp.asarray([[[4.0, 2.0, 6.0]]])
        mask = jnp.ones((1, 1, 3), bool)
        assert float(d1_metric(pred, gt, mask)) == pytest.approx(1 / 3)

    def test_thres_metric(self):
        gt = jnp.zeros((1, 1, 4))
        pred = jnp.asarray([[[0.5, 1.5, 2.5, 3.5]]])
        mask = jnp.ones((1, 1, 4), bool)
        assert float(thres_metric(pred, gt, mask, 1.0)) == pytest.approx(3 / 4)
        assert float(thres_metric(pred, gt, mask, 3.0)) == pytest.approx(1 / 4)

    def test_compute_metrics_occ_filter(self):
        """occ subset below 1% of valid pixels is filtered out
        (metrics.py:44-64)."""
        h = 32
        pred = jnp.zeros((1, h, h))
        gt = jnp.ones((1, h, h))
        valid = jnp.ones((1, h, h), bool)
        occ = jnp.zeros((1, h, h), bool).at[0, 0, 0].set(True)  # 1/1024 < 1%
        m = compute_metrics(pred, gt, valid, occ)
        assert "epe" in m and "epe_noc" in m
        assert "epe_occ" not in m

    def test_average_meter(self):
        am = AverageMeterDict()
        am.update({"epe": 1.0})
        am.update({"epe": 3.0, "d1": 0.5})
        assert am.mean() == {"epe": 2.0, "d1": 0.5}

    def test_nan_predictions_surface_as_failure(self):
        """A diverged (NaN) prediction must NOT score as perfect: error-rate
        metrics count non-finite error as bad, EPE propagates NaN, and the
        meter's mean stays NaN instead of dropping the key (regression for
        the 2k-step e2e run that reported d1=0.0 with all-NaN output)."""
        pred = jnp.full((1, 2, 2), jnp.nan)
        gt = jnp.ones((1, 2, 2))
        mask = jnp.ones((1, 2, 2), bool)
        assert float(d1_metric(pred, gt, mask)) == pytest.approx(1.0)
        assert float(thres_metric(pred, gt, mask, 3.0)) == pytest.approx(1.0)
        assert not np.isfinite(float(epe_metric(pred, gt, mask)))
        am = AverageMeterDict()
        am.update({"epe": float("nan"), "d1": 1.0})
        am.update({"epe": 2.0, "d1": 1.0})
        means = am.mean()
        assert not np.isfinite(means["epe"]) and means["d1"] == 1.0


class TestPadder:
    @pytest.mark.parametrize("mode", ["sintel", "kitti"])
    @pytest.mark.parametrize("divis", [8, 16, 32])
    def test_roundtrip(self, mode, divis, rng):
        h, w = 375, 1242  # KITTI native
        x = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
        p = InputPadder(x.shape, mode=mode, divis_by=divis)
        (xp,) = p.pad(x)
        assert xp.shape[1] % divis == 0 and xp.shape[2] % divis == 0
        back = p.unpad(xp)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        t, b, l, r = p.get_pad_num()
        assert (t + b + h, l + r + w) == (xp.shape[1], xp.shape[2])
        if mode != "sintel":
            assert t == 0  # kitti mode: all height padding at the bottom

    def test_already_divisible_no_pad(self):
        p = InputPadder((1, 320, 736, 3), divis_by=32)
        assert p.get_pad_num() == [0, 0, 0, 0]


class TestOcclusion:
    def test_warp_identity_at_zero_disp(self, rng):
        m = jnp.asarray(rng.rand(1, 4, 8).astype(np.float32))
        out = warp_disparity(m, jnp.zeros((1, 4, 8)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(m), atol=1e-6)

    def test_consistent_stereo_not_occluded(self):
        """Constant-disparity pair is LR-consistent everywhere sampled in
        bounds → not occluded."""
        d = 5.0
        disp_l = jnp.full((1, 3, 10), d)
        disp_r = jnp.full((1, 3, 10), d)
        occ = occ_mask(disp_l, disp_r)
        # first 2 columns sample out of bounds (warp reads zeros) → occluded
        assert bool(occ[:, :, int(d) :].sum() == 0)
        assert bool(occ[:, :, : int(d)].all())


class TestIou:
    def test_iou_metric(self):
        from anystereo_tpu.eval.metrics import iou_metric

        p = jnp.zeros((1, 4, 4), bool).at[0, :2].set(True)   # 8 px
        g = jnp.zeros((1, 4, 4), bool).at[0, 1:3].set(True)  # 8 px, overlap 4
        assert float(iou_metric(p, g)) == pytest.approx(4 / 12)
