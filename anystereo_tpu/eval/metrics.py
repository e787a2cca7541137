"""Evaluation metrics — the reference's exact semantics
(metrics_utils/metrics.py):

  * epe_metric (:84-90): masked mean-L1, averaged per image then over the
    batch (the `make_iterative_func` decorator, :22-30);
  * d1_metric (:66-72): error > 3 px AND > 5% of |gt|;
  * thres_metric (:74-81): error > t px;
  * the `_filter` rule (:44-64): a (mask-pair, image) contributes only when
    the evaluated mask covers ≥ 1% of the valid GT pixels.

All return fp32 scalars; inputs are [B, H, W] (or [B, Q]) arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def _per_image_masked_mean(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid pixels per image, then mean over images that have any
    valid pixel (the reference averages per-image via the decorator).

    Masked-out values are dropped with `where`, not multiplied by 0: the
    reference boolean-indexes (`disp_est[mask]`) so an inf GT at an
    INVALID pixel never enters the sum — `inf * 0 = NaN` would poison the
    whole mean (Middlebury/ETH3D PFMs encode missing GT as inf)."""
    m = mask.astype(jnp.float32)
    axes = tuple(range(1, value.ndim))
    value = jnp.where(m > 0, value, 0.0)
    per_img = value.sum(axes) / jnp.maximum(m.sum(axes), 1.0)
    has = (m.sum(axes) > 0).astype(jnp.float32)
    return (per_img * has).sum() / jnp.maximum(has.sum(), 1.0)


def epe_metric(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return _per_image_masked_mean(jnp.abs(pred - gt), mask)


def d1_metric(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    err = jnp.abs(pred - gt)
    # written as ~(ok) so a non-finite prediction counts as BAD — `err > 3`
    # would compare NaN as False and score a diverged model as perfect
    bad = ~((err <= 3.0) | (err <= 0.05 * jnp.abs(gt)))
    return _per_image_masked_mean(bad.astype(jnp.float32), mask)


def thres_metric(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, thres: float
) -> jnp.ndarray:
    err = jnp.abs(pred - gt)
    # ~(err <= t): non-finite error counts as over-threshold (see d1_metric)
    return _per_image_masked_mean((~(err <= thres)).astype(jnp.float32), mask)


def mask_cover_ok(mask: jnp.ndarray, valid: jnp.ndarray, frac: float = 0.01) -> bool:
    """The `_filter` rule (metrics.py:44-64): evaluate a sub-mask (e.g. occ)
    only if it covers ≥ frac of the valid GT pixels."""
    return bool(mask.sum() >= frac * max(float(valid.sum()), 1.0))


def compute_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray,
    occ: Optional[jnp.ndarray] = None,
) -> Dict[str, float]:
    """The full per-image metric set the validators emit
    (evaluation_validate.py:289-305): EPE/D1/Thres{1,2,3} over all valid
    pixels and, when an occlusion mask is given, over occ/noc subsets
    (subject to the 1% cover filter)."""
    out = {}

    def add(suffix, m):
        out[f"epe{suffix}"] = float(epe_metric(pred, gt, m))
        out[f"d1{suffix}"] = float(d1_metric(pred, gt, m))
        for t in (1.0, 2.0, 3.0):
            out[f"thres{int(t)}{suffix}"] = float(thres_metric(pred, gt, m, t))

    add("", valid)
    if occ is not None:
        occ_m = valid & occ
        noc_m = valid & ~occ
        if mask_cover_ok(occ_m, valid):
            add("_occ", occ_m)
        if mask_cover_ok(noc_m, valid):
            add("_noc", noc_m)
    return out


def iou_metric(pred_mask: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Binary-mask IoU, per image then averaged (compute_iou,
    metrics_utils/metrics.py:152-173; used for occlusion-prediction heads)."""
    p = pred_mask.astype(bool)
    g = gt_mask.astype(bool)
    axes = tuple(range(1, p.ndim))
    inter = (p & g).sum(axes).astype(jnp.float32)
    union = (p | g).sum(axes).astype(jnp.float32)
    return (inter / jnp.maximum(union, 1.0)).mean()


class AverageMeterDict:
    """Running means over per-image metric dicts
    (metrics_utils/experiment.py:112-153)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def update(self, d: Dict[str, float]) -> None:
        for k, v in d.items():
            if v is None:
                continue
            # non-finite values are summed, not dropped: a NaN per-image
            # metric must surface as a NaN mean (the reference's meter,
            # experiment.py:112-153, sums unconditionally) — silently
            # skipping them once made an all-NaN run lose its `epe` key
            # and report d1=0.0, i.e. a diverged model scored as perfect
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
            self.counts[k] = self.counts.get(k, 0) + 1

    def mean(self) -> Dict[str, float]:
        return {k: self.sums[k] / self.counts[k] for k in self.sums}
