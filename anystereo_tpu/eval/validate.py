"""Held-out-split validators — the reference's evaluation protocol
(evaluation_validate.py:121-533) on the TPU model.

Per image: pad to divisibility (32; 16 for non-IGEV multi-scale models,
:74-77), run the model in eval mode with valid_iters GRU iterations, decode
at the ORIGINAL resolution through the query path, mask, and aggregate
EPE/D1/Thres{1,2,3} per image (AverageMeterDict).  The arbitrary-scale
protocol (pad_for_multi_train, :66-90) bicubic-downscales the inputs by
scale_test and queries the original-resolution grid, exercising the
implicit decoder's super-resolution path.

Valid-mask semantics: KITTI/SceneFlow take validity from the dataset
reader (sparse PNG > 0 / finite PFM).  Middlebury and ETH3D must NOT — the
reference's valid mask there is `(valid_gt >= -0.5) & (disp_gt < 1000)`
(evaluation_validate.py:164-166, :480-482), and since valid_gt is a 0/1
mask the first clause is vacuous: "all" means every pixel with finite GT
< 1000 INCLUDING occluded ones.  Conflating validity with the reader's
nocc mask silently turns "all" metrics into noc-only and empties the occ
subset; `valid_from_gt=True` selects the correct GT-derived validity.

Occlusion splits: KITTI compares disp_occ vs disp_noc GT (:271-282);
Middlebury/ETH3D read mask0nocc.png beside disp0GT.pfm (:161-166,
:479-480); SceneFlow uses the LR-consistency check
(eval.occlusion.occ_mask) when right-view GT exists.  Middlebury 2014
(disp0.pfm) has no occlusion GT — the provider returns None there.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from anystereo_tpu.config import CoreType, ModelConfig
from anystereo_tpu.eval.metrics import AverageMeterDict, compute_metrics
from anystereo_tpu.eval.padder import InputPadder
from anystereo_tpu.nn.model import AnyStereo
from anystereo_tpu.ops.coords import make_coord

log = logging.getLogger(__name__)


def _pad_common(left, right, scale_test: float, divis: int):
    assert scale_test > 0.99
    h_want, w_want = left.shape[1:3]
    h_lr = int(math.ceil(h_want / float(scale_test)))
    w_lr = int(math.ceil(w_want / float(scale_test)))
    if scale_test > 1:
        left = cv2.resize(left[0], (w_lr, h_lr), interpolation=cv2.INTER_CUBIC)[None]
        right = cv2.resize(right[0], (w_lr, h_lr), interpolation=cv2.INTER_CUBIC)[None]
    padder = InputPadder(left.shape, divis_by=divis)
    left_p, right_p = padder.pad(jnp.asarray(left), jnp.asarray(right))
    t, b, l, r = padder.get_pad_num()
    h_hr_pad = round(left_p.shape[1] * scale_test)
    w_hr_pad = round(left_p.shape[2] * scale_test)
    if scale_test > 1:
        t, b, l, r = (round(i * scale_test) for i in (t, b, l, r))
    return left_p, right_p, (h_want, w_want), (h_hr_pad, w_hr_pad), (t, b, l, r)


def _axis_centers_np(n: int) -> np.ndarray:
    r = 1.0 / n
    return (-1 + r + 2 * r * np.arange(n)).astype(np.float32)


def pad_for_queries(left, right, scale_test: float, divis: int):
    """pad_for_multi_train (evaluation_validate.py:66-90): downscale inputs
    by scale_test, pad to divisibility, build queries covering the original
    (unpadded, full-res) pixel grid inside the padded coordinate frame.

    left/right: [1, H, W, 3] numpy.  Returns (left_pad, right_pad,
    coords [1, H*W, 2], scale).
    """
    left_p, right_p, (h_want, w_want), (hp, wp), (t, b, l, r) = _pad_common(
        left, right, scale_test, divis
    )
    grid = np.asarray(make_coord((hp, wp), flatten=False))
    grid = grid[t : hp - b, l : wp - r]
    if grid.shape[:2] != (h_want, w_want):
        # off-by-rounding fix-up (evaluation_validate.py:87-89)
        grid = cv2.resize(grid, (w_want, h_want), interpolation=cv2.INTER_LINEAR)
    coords = grid.reshape(1, h_want * w_want, 2)
    return left_p, right_p, jnp.asarray(coords), float(scale_test)


def pad_for_dense_grid(left, right, scale_test: float, divis: int):
    """Separable twin of pad_for_queries: the cropped query grid is an
    outer product of per-axis center sequences, so return (ys [H], xs [W])
    for the model's gather-free dense decode."""
    left_p, right_p, (h_want, w_want), (hp, wp), (t, b, l, r) = _pad_common(
        left, right, scale_test, divis
    )
    ys = _axis_centers_np(hp)[t : hp - b]
    xs = _axis_centers_np(wp)[l : wp - r]
    if len(ys) != h_want:
        ys = cv2.resize(ys.reshape(-1, 1), (1, h_want),
                        interpolation=cv2.INTER_LINEAR).ravel()
    if len(xs) != w_want:
        xs = cv2.resize(xs.reshape(-1, 1), (1, w_want),
                        interpolation=cv2.INTER_LINEAR).ravel()
    return left_p, right_p, jnp.asarray(ys), jnp.asarray(xs), float(scale_test)


def pad_for_fixed_upscale(left, right, up: int, divis: int = 16):
    """pad_for_multi_train_Fixed (evaluation_validate.py:93-108): inputs are
    NOT downscaled; the decoder queries an exact up-x grid over the padded
    frame, cropped to up x the original extent (the Middlebury Q→F / H→F
    protocol).  Returns (left_p, right_p, ys, xs, scale=up)."""
    padder = InputPadder(left.shape, divis_by=divis)
    left_p, right_p = padder.pad(jnp.asarray(left), jnp.asarray(right))
    t, b, l, r = padder.get_pad_num()
    hp, wp = left_p.shape[1] * up, left_p.shape[2] * up
    ys = _axis_centers_np(hp)[t * up : hp - b * up]
    xs = _axis_centers_np(wp)[l * up : wp - r * up]
    assert len(ys) == left.shape[1] * up and len(xs) == left.shape[2] * up
    return left_p, right_p, jnp.asarray(ys), jnp.asarray(xs), float(up)


def kitti_occ_provider(dataset, index) -> Optional[np.ndarray]:
    """Occlusion mask for KITTI: the reference compares the disp_occ and
    disp_noc GT images (evaluation_validate.py:271-282 — note its
    mask_occlu name actually selects occ==noc, i.e. the NON-occluded
    region; here True = genuinely occluded)."""
    occ_path = dataset.disparity_list[index]
    noc_path = occ_path.replace("disp_occ_0", "disp_noc_0").replace(
        "disp_occ", "disp_noc"
    )
    if noc_path == occ_path or not os.path.exists(noc_path):
        return None
    from PIL import Image

    occ_img = np.asarray(Image.open(occ_path))
    noc_img = np.asarray(Image.open(noc_path))
    return occ_img != noc_img


def sceneflow_occ_provider(dataset, index) -> Optional[np.ndarray]:
    """SceneFlow: occlusion by left-right GT consistency
    (evaluation_validate.py:366 with occ_mask/warp,
    metrics_utils/experiment.py:267-296): a pixel is occluded when the
    right-view disparity warped to the left disagrees by > 3 px."""
    left_path = dataset.disparity_list[index]
    right_path = left_path.replace("/left/", "/right/")
    if right_path == left_path or not os.path.exists(right_path):
        return None
    from anystereo_tpu.data.frame_utils import read_pfm
    from anystereo_tpu.eval.occlusion import occ_mask

    dl = read_pfm(left_path)
    dr = read_pfm(right_path)
    return np.asarray(occ_mask(jnp.asarray(dl)[None], jnp.asarray(dr)[None]))[0]


def nocc_mask_occ_provider(dataset, index) -> Optional[np.ndarray]:
    """Middlebury/ETH3D: occluded = complement of the mask0nocc mask, read
    from mask0nocc.png beside disp0GT.pfm exactly as the reference eval
    does (evaluation_validate.py:161-166, :479-480; the `==255` test
    matches its `occ_mask==255`).

    Middlebury 2014 (disp0.pfm) ships no occlusion GT — its reader tuple's
    second element is a disp<1e3 validity mask, NOT a nocc mask, so return
    None rather than mislabel invalid pixels as occluded.  The tuple
    fallback remains for readers that genuinely return (disp, nocc)."""
    path = dataset.disparity_list[index]
    mask_path = path.replace("disp0GT.pfm", "mask0nocc.png")
    if mask_path != path and os.path.exists(mask_path):
        from PIL import Image

        return np.asarray(Image.open(mask_path).convert("L")) != 255
    if os.path.basename(path) == "disp0.pfm":
        return None
    disp = dataset.reader(path)
    if isinstance(disp, tuple):
        _, nocc = disp
        return ~np.asarray(nocc, bool)
    return None


def _as_variables(params):
    """Accept either a bare params tree or a full variables dict (with
    batch_stats for the frozen-BN reference regime)."""
    if isinstance(params, dict) and "params" in params:
        return dict(params)
    return {"params": params}


class Validator:
    """Caches one jitted eval function per padded shape (per-image loop has
    a handful of shape buckets per dataset).

    bucket: round padded shapes up to multiples of `bucket` (must be a
    multiple of the model's divis) so mixed-size datasets (Middlebury 2014,
    ETH3D) share compiled executables instead of paying a fresh XLA compile
    per distinct image shape.  The extra rows/cols are replicate-edge
    padding and the decode grid still crops to the original extent, so
    results match the unbucketed protocol up to border-context effects
    (metrics typically shift < 1%); off by default to keep the reference
    protocol bit-for-bit."""

    def __init__(self, model: AnyStereo, params, valid_iters: int = 32,
                 bucket: Optional[int] = None):
        self.model = model
        self.params = params
        self.valid_iters = valid_iters
        self.bucket = bucket
        self._fns = {}

    def _fn(self, shape, q):
        key = (shape, q)
        if key not in self._fns:
            iters = self.valid_iters
            # round-5: the dense separable decode covers every sampling
            # mode (incl. quarter_nearest / local_ensemble) — all configs
            # evaluate gather-free (LiifDecoder._decode_dense)

            def f(params, left, right, ys, xs, scale):
                out = self.model.apply(
                    _as_variables(params), left, right, iters=iters,
                    dense_grid=(ys, xs), scale=scale, mode="eval",
                )
                return out.disp_final

            self._fns[key] = jax.jit(f)
        return self._fns[key]

    def infer(self, left: np.ndarray, right: np.ndarray, scale_test: float = 1.0,
              divis: int = 32, fixed_upscale: Optional[int] = None,
              eval_others: bool = False) -> np.ndarray:
        """left/right [H, W, 3] → disparity at original resolution (or
        fixed_upscale x it — the Middlebury Q→F/H→F protocol); gather-free
        dense decode.

        eval_others: the reference's `multi_evaothers` comparison protocol
        (pad_for_muti_other, evaluation_validate.py:109-118 + :147-154):
        bicubic-downscale the inputs by scale_test, run PLAIN full-res
        inference on the LR pair, multiply the disparity by scale_test and
        bicubic-upscale back to the original grid — the non-LIIF baseline
        any implicit-decoder superiority claim is measured against."""
        if self.bucket is not None and not (eval_others and scale_test > 1):
            # Bucketed path: pad H/W up to bucket multiples AND decode the
            # FULL padded grid, cropping host-side — both the input and the
            # output shapes then repeat across images, so one XLA compile
            # serves the whole bucket.  The decode is per-query, so the
            # crop is exact; only the replicate-edge border context differs
            # from the minimal-padding protocol.
            assert self.bucket % divis == 0, (self.bucket, divis)
            assert scale_test == 1.0, \
                "shape bucketing supports scale_test=1 / fixed-upscale only"
            up = 1 if fixed_upscale is None else int(fixed_upscale)
            padder = InputPadder(left[None].shape, divis_by=self.bucket)
            lp, rp = padder.pad(
                jnp.asarray(left[None].astype(np.float32)),
                jnp.asarray(right[None].astype(np.float32)),
            )
            t, b, l, r = padder.get_pad_num()
            hp, wp = lp.shape[1] * up, lp.shape[2] * up
            ys = jnp.asarray(_axis_centers_np(hp))
            xs = jnp.asarray(_axis_centers_np(wp))
            fn = self._fn(tuple(lp.shape), (hp, wp))
            disp = fn(self.params, lp, rp, ys, xs,
                      jnp.asarray([float(up)], jnp.float32))
            disp = np.asarray(disp).reshape(hp, wp)
            return disp[t * up : hp - b * up, l * up : wp - r * up]
        if eval_others and scale_test > 1:
            h, w = left.shape[:2]
            h_lr = int(math.ceil(h / float(scale_test)))
            w_lr = int(math.ceil(w / float(scale_test)))
            left_lr = cv2.resize(left, (w_lr, h_lr), interpolation=cv2.INTER_CUBIC)
            right_lr = cv2.resize(right, (w_lr, h_lr), interpolation=cv2.INTER_CUBIC)
            pred_lr = self.infer(left_lr, right_lr, 1.0, divis)
            return cv2.resize(
                pred_lr * float(scale_test), (w, h), interpolation=cv2.INTER_CUBIC
            )
        if fixed_upscale is not None:
            # divis must follow the model family here too (IGEV's hourglass
            # needs 32-divisible padding; 16 crashes its level-2 skip concat
            # on H/16-odd inputs)
            lp, rp, ys, xs, s = pad_for_fixed_upscale(
                left[None].astype(np.float32), right[None].astype(np.float32),
                fixed_upscale, divis,
            )
        else:
            lp, rp, ys, xs, s = pad_for_dense_grid(
                left[None].astype(np.float32), right[None].astype(np.float32),
                scale_test, divis,
            )
        fn = self._fn(tuple(lp.shape), (len(ys), len(xs)))
        disp = fn(self.params, lp, rp, ys, xs, jnp.asarray([s], jnp.float32))
        return np.asarray(disp).reshape(len(ys), len(xs))


def validate_dataset(
    model: AnyStereo,
    params,
    dataset,
    valid_iters: int = 32,
    scale_test: float = 1.0,
    divis: int = 32,
    max_disp: float = 1000.0,
    max_images: Optional[int] = None,
    fixed_upscale: Optional[int] = None,
    report_dir: Optional[str] = None,
    dump_images: bool = False,
    occ_provider=None,
    valid_from_gt: bool = False,
    eval_others: bool = False,
    bucket: Optional[int] = None,
) -> Dict[str, float]:
    """Generic per-image validation driver over a StereoDataset (no
    augmentor).  `dataset` must yield full-resolution samples; with
    fixed_upscale, GT must be at upscale x the input resolution.
    report_dir enables result.txt (+ colored PNG / error-map dumps with
    dump_images) — the reference's --record/--output flags.

    valid_from_gt: derive validity from the GT itself over ALL pixels
    (finite ∧ >0 ∧ <max_disp — evaluation_validate.py:480-482's
    `(valid_gt>=-0.5)&(disp_gt<1000)` with the vacuous first clause
    dropped), NOT from the reader's valid channel.  Required for
    Middlebury/ETH3D whose readers surface the nocc mask as `valid`:
    using it would make "all" metrics noc-only and the occ subset empty.

    eval_others: the reference's `multi_evaothers` bicubic-upscale
    comparison protocol (see Validator.infer).  bucket: shape-bucketed
    padding to cap per-shape XLA compiles on mixed-size datasets (see
    Validator)."""
    vd = Validator(model, params, valid_iters, bucket=bucket)
    meter = AverageMeterDict()
    n = len(dataset) if max_images is None else min(len(dataset), max_images)
    for i in range(n):
        img1, img2, flow, valid = dataset._load_raw(i)
        gt = flow[..., 0]
        pred = vd.infer(img1, img2, scale_test, divis, fixed_upscale,
                        eval_others=eval_others)
        if valid_from_gt:
            vmask = np.isfinite(gt) & (gt > 0) & (gt < max_disp)
        else:
            vmask = (np.asarray(valid) > 0) & (gt > 0) & (gt < max_disp)
        occ = occ_provider(dataset, i) if occ_provider is not None else None
        m = compute_metrics(
            jnp.asarray(pred)[None],
            jnp.asarray(gt)[None],
            jnp.asarray(vmask)[None],
            None if occ is None else jnp.asarray(occ)[None],
        )
        meter.update(m)
        if report_dir is not None:
            from anystereo_tpu.eval import reporting

            name = os.path.basename(os.path.dirname(dataset.image_list[i][0]))
            name = f"{name}_{i:04d}"
            reporting.append_result_line(
                os.path.join(report_dir, "result.txt"), name, m
            )
            if dump_images:
                reporting.dump_disparity_png(
                    os.path.join(report_dir, "output"), name, pred
                )
                reporting.dump_error_map_png(
                    os.path.join(report_dir, "output"), name, pred, gt, vmask[0]
                    if vmask.ndim == 3 else vmask,
                )
        if (i + 1) % 20 == 0:
            log.info("validate %d/%d: %s", i + 1, n, meter.mean())
    results = meter.mean()
    if report_dir is not None:
        from anystereo_tpu.eval import reporting

        reporting.write_summary(
            os.path.join(report_dir, "result.txt"), results, header="summary"
        )
    return results


def build_eval_dataset(dataset: str, data_root: str):
    """Resolve a validation-dataset name to (dataset, fixed_upscale,
    occ_provider, valid_from_gt) — shared by the standalone evaluator and
    the in-training validation hook (the reference's validate_* dispatch,
    train_continuous_IGEV.py:242-264).  valid_from_gt is True for
    Middlebury/ETH3D (see validate_dataset)."""
    from anystereo_tpu.data.datasets import (
        ETH3D,
        KittiMixed,
        Middlebury,
        SceneFlowDataset,
    )

    fixed_upscale = None
    if dataset == "sceneflow":
        ds = SceneFlowDataset(data_root, aug=None, things_test=True)
    elif dataset == "kitti15":
        ds = KittiMixed(data_root, data_root, aug=None, mode="valid_15")
    elif dataset == "kitti12":
        ds = KittiMixed(data_root, data_root, aug=None, mode="valid_12")
    elif dataset in ("middlebury_Q_F", "middlebury_H_F"):
        # fixed-scale arbitrary-scale protocol (evaluation_validate.py:
        # 430-436): inputs from the Q/H split, GT from the F split,
        # decoded at 4x / 2x
        src = dataset.split("_")[1]
        fixed_upscale = 4 if src == "Q" else 2
        ds = Middlebury(data_root, aug=None, split=src)
        full = Middlebury(data_root, aug=None, split="F")
        ds.disparity_list = full.disparity_list
    elif dataset.startswith("middlebury_"):
        ds = Middlebury(data_root, aug=None, split=dataset.split("_")[1])
    elif dataset == "eth3d":
        ds = ETH3D(data_root, aug=None)
    else:
        raise ValueError(dataset)

    occ_provider = None
    valid_from_gt = False
    if dataset.startswith("kitti"):
        occ_provider = kitti_occ_provider
    elif dataset.startswith("middlebury") or dataset == "eth3d":
        occ_provider = nocc_mask_occ_provider
        valid_from_gt = True
    elif dataset == "sceneflow":
        occ_provider = sceneflow_occ_provider
    return ds, fixed_upscale, occ_provider, valid_from_gt


def make_train_validate_fn(
    model: AnyStereo,
    dataset: str,
    data_root: str,
    valid_iters: int = 32,
    max_images: Optional[int] = None,
):
    """Build a `validate_fn(state, step)` for the training loop — the
    reference's in-training validation every valid_fre steps
    (train_continuous_IGEV.py:242-264).  The returned callable runs the
    held-out split with the CURRENT params and returns the metric dict."""
    ds, fixed_upscale, occ_provider, valid_from_gt = build_eval_dataset(
        dataset, data_root
    )
    divis = 32 if model.cfg.core is CoreType.IGEV else 16

    def validate_fn(state, step: int) -> Dict[str, float]:
        return validate_dataset(
            model, jax.device_get(state.params), ds, valid_iters,
            divis=divis, max_images=max_images, fixed_upscale=fixed_upscale,
            occ_provider=occ_provider, valid_from_gt=valid_from_gt,
        )

    return validate_fn


def run_validation(
    model_cfg: ModelConfig,
    ckpt_dir: str,
    dataset: str,
    data_root: str,
    valid_iters: int = 32,
    scale_test: float = 1.0,
    max_images: Optional[int] = None,
    eval_others: bool = False,
    bucket: Optional[int] = None,
) -> Dict[str, float]:
    """CLI wrapper: build dataset + model, restore weights, validate."""
    from anystereo_tpu.train.state import restore_eval_variables

    ds, fixed_upscale, occ_provider, valid_from_gt = build_eval_dataset(
        dataset, data_root
    )
    model = AnyStereo(model_cfg)
    sample1, sample2, _, _ = ds._load_raw(0)
    lp, rp, ys, xs, s = pad_for_dense_grid(
        sample1[None].astype(np.float32), sample2[None].astype(np.float32),
        scale_test, 32,
    )
    decode_kw = dict(dense_grid=(ys, xs))
    variables = jax.jit(
        lambda k: model.init(
            k, lp, rp, iters=1, scale=jnp.asarray([s]), mode="eval",
            **decode_kw,
        )
    )(jax.random.PRNGKey(0))
    eval_vars = restore_eval_variables(ckpt_dir, variables)
    divis = 32 if model_cfg.core is CoreType.IGEV else 16
    return validate_dataset(
        model, eval_vars, ds, valid_iters, scale_test, divis,
        max_images=max_images, fixed_upscale=fixed_upscale,
        occ_provider=occ_provider, valid_from_gt=valid_from_gt,
        eval_others=eval_others, bucket=bucket,
    )
