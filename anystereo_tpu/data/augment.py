"""Stereo augmentation (numpy/cv2; runs in loader workers, off-device).

Spec: models/coreContinuous_IGEV/utils/augmentor.py —
  * photometric: ColorJitter(brightness .4, contrast .4, saturation range,
    hue .5/3.14) + AdjustGamma, asymmetric w.p. 0.2 (:78-96).  torchvision
    is not available here; the jitter is reimplemented in numpy with the
    same factor ranges and random application order;
  * eraser occlusion on the right image w.p. 0.5, 1-2 rectangles 50-100 px,
    filled with the right image's mean color (:98-111);
  * spatial: scale 2^U(min,max), stretch w.p. 0.8, h/v flips, y-jitter ±2 px
    (:113-177);
  * WoCrop multi-scale variants (:192-318, :460-595): crop at the dynamic
    HR size, then bicubic-downscale IMAGES ONLY to the LR input size —
    creating the LR-input/HR-GT pairs of arbitrary-scale training;
  * sparse variants: scatter-based flow-map rescale (:363-395) and
    margin-clipped crops (:431-438).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)


# ------------------------------------------------------------------ #
# photometric
# ------------------------------------------------------------------ #


def _blend(a: np.ndarray, b: np.ndarray, f: float) -> np.ndarray:
    return np.clip(f * a + (1.0 - f) * b, 0, 255)


def _adjust_brightness(img: np.ndarray, f: float) -> np.ndarray:
    return np.clip(img * f, 0, 255)


def _adjust_contrast(img: np.ndarray, f: float) -> np.ndarray:
    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
    return _blend(img, gray, f)


def _adjust_saturation(img: np.ndarray, f: float) -> np.ndarray:
    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)[..., None]
    return _blend(img, gray, f)


def _adjust_hue(img: np.ndarray, shift: float) -> np.ndarray:
    """shift in [-0.5, 0.5] turns of the hue circle."""
    hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV)
    h = hsv[..., 0].astype(np.int32)  # cv2 hue is [0, 180)
    hsv[..., 0] = ((h + int(round(shift * 180))) % 180).astype(hsv.dtype)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)


def _adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    return np.clip(255.0 * gain * (img / 255.0) ** gamma, 0, 255)


@dataclasses.dataclass
class ColorJitter:
    brightness: float = 0.4
    contrast: float = 0.4
    saturation: Tuple[float, float] = (0.0, 1.4)
    hue: float = 0.5 / 3.14
    gamma: Tuple[float, float, float, float] = (1, 1, 1, 1)  # (gmin,gmax,gainmin,gainmax)

    def __call__(self, img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        img = img.astype(np.float32)
        ops = []
        b = rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
        c = rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
        s = rng.uniform(*self.saturation)
        h = rng.uniform(-self.hue, self.hue)
        ops = [
            lambda x: _adjust_brightness(x, b),
            lambda x: _adjust_contrast(x, c),
            lambda x: _adjust_saturation(x, s),
            lambda x: _adjust_hue(x, h),
        ]
        for i in rng.permutation(4):  # torchvision applies in random order
            img = ops[i](img)
        gmin, gmax, gainmin, gainmax = self.gamma
        if (gmin, gmax) != (1, 1) or (gainmin, gainmax) != (1, 1):
            img = _adjust_gamma(
                img, rng.uniform(gmin, gmax), rng.uniform(gainmin, gainmax)
            )
        return img.astype(np.uint8)


# ------------------------------------------------------------------ #
# augmentors
# ------------------------------------------------------------------ #


@dataclasses.dataclass
class AugmentorConfig:
    crop_size: Tuple[int, int] = (320, 736)
    min_scale: float = -0.2
    max_scale: float = 0.4
    do_flip: Optional[str] = None  # 'h' | 'v' | 'hf' | None
    yjitter: bool = False
    saturation_range: Tuple[float, float] = (0.0, 1.4)
    gamma: Tuple[float, float, float, float] = (1, 1, 1, 1)
    # None → resolved by density: 1.0 dense (FlowAugmentor), 0.8 sparse
    # (SparseFlowAugmentor, augmentor.py:330 — 20% of sparse samples keep
    # native resolution with un-scattered GT)
    spatial_aug_prob: Optional[float] = None
    stretch_prob: float = 0.8
    max_stretch: float = 0.2
    h_flip_prob: float = 0.5
    v_flip_prob: float = 0.1
    asymmetric_color_prob: float = 0.2  # dense only; sparse always symmetric
    eraser_prob: float = 0.5


class StereoAugmentor:
    """Dense-GT augmentor (FlowAugmentor / FlowAugmentorWoCrop)."""

    def __init__(self, cfg: AugmentorConfig, sparse: bool = False):
        self.cfg = cfg
        self.sparse = sparse
        self.spatial_prob = (
            cfg.spatial_aug_prob
            if cfg.spatial_aug_prob is not None
            else (0.8 if sparse else 1.0)
        )
        sat = cfg.saturation_range
        if sparse:
            self.jitter = ColorJitter(0.3, 0.3, sat, 0.3 / 3.14, cfg.gamma)
        else:
            self.jitter = ColorJitter(0.4, 0.4, sat, 0.5 / 3.14, cfg.gamma)

    # -- photometric ------------------------------------------------ #

    def color_transform(self, img1, img2, rng):
        if not self.sparse and rng.rand() < self.cfg.asymmetric_color_prob:
            return self.jitter(img1, rng), self.jitter(img2, rng)
        stack = np.concatenate([img1, img2], axis=0)
        stack = self.jitter(stack, rng)
        return np.split(stack, 2, axis=0)

    def eraser_transform(self, img1, img2, rng, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if rng.rand() < self.cfg.eraser_prob:
            img2 = img2.copy()
            mean_color = img2.reshape(-1, 3).mean(axis=0)
            for _ in range(rng.randint(1, 3)):
                x0, y0 = rng.randint(0, wd), rng.randint(0, ht)
                dx, dy = rng.randint(*bounds), rng.randint(*bounds)
                img2[y0 : y0 + dy, x0 : x0 + dx] = mean_color
        return img1, img2

    # -- spatial ---------------------------------------------------- #

    def _sample_scales(self, ht, wd, crop, rng):
        pad = 1 if self.sparse else 8
        min_scale = max((crop[0] + pad) / ht, (crop[1] + pad) / wd)
        scale = 2 ** rng.uniform(self.cfg.min_scale, self.cfg.max_scale)
        sx = sy = scale
        if not self.sparse and rng.rand() < self.cfg.stretch_prob:
            sx *= 2 ** rng.uniform(-self.cfg.max_stretch, self.cfg.max_stretch)
            sy *= 2 ** rng.uniform(-self.cfg.max_stretch, self.cfg.max_stretch)
        return max(sx, min_scale), max(sy, min_scale)

    def _resize_sparse_flow(self, flow, valid, fx, fy):
        """Scatter-based rescale of a sparse flow map (augmentor.py:363-395).
        Uses the C++ hot loop (native/anystereo_native.cpp) when built."""
        try:
            from anystereo_tpu.data import native_io

            if native_io.available():
                return native_io.scatter_resize_sparse(
                    np.ascontiguousarray(flow, np.float32),
                    np.ascontiguousarray(valid, np.float32),
                    fx,
                    fy,
                )
        except ImportError:
            pass
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)), axis=-1)
        coords = coords.reshape(-1, 2).astype(np.float32)
        flow_f = flow.reshape(-1, 2).astype(np.float32)
        valid_f = valid.reshape(-1).astype(np.float32)
        c0 = coords[valid_f >= 1]
        f0 = flow_f[valid_f >= 1]
        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        c1 = c0 * [fx, fy]
        f1 = f0 * [fx, fy]
        xx = np.round(c1[:, 0]).astype(np.int32)
        yy = np.round(c1[:, 1]).astype(np.int32)
        keep = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        out_flow = np.zeros([ht1, wd1, 2], np.float32)
        out_valid = np.zeros([ht1, wd1], np.int32)
        out_flow[yy[keep], xx[keep]] = f1[keep]
        out_valid[yy[keep], xx[keep]] = 1
        return out_flow, out_valid

    def _flips(self, img1, img2, flow, valid, rng):
        cfg = self.cfg
        if cfg.do_flip:
            if rng.rand() < cfg.h_flip_prob and cfg.do_flip == "hf":
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
                if valid is not None:
                    valid = valid[:, ::-1]
            if rng.rand() < cfg.h_flip_prob and cfg.do_flip == "h":
                # stereo-correct horizontal flip: swap + mirror both views
                img1, img2 = img2[:, ::-1], img1[:, ::-1]
            if rng.rand() < cfg.v_flip_prob and cfg.do_flip == "v":
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * [1.0, -1.0]
                if valid is not None:
                    valid = valid[::-1]
        return img1, img2, flow, valid

    def spatial_transform(self, img1, img2, flow, valid, crop, rng,
                          margin_crop: bool = True):
        cfg = self.cfg
        sx, sy = self._sample_scales(img1.shape[0], img1.shape[1], crop, rng)
        if rng.rand() < self.spatial_prob:
            img1 = cv2.resize(img1, None, fx=sx, fy=sy, interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=sx, fy=sy, interpolation=cv2.INTER_LINEAR)
            if self.sparse:
                flow, valid = self._resize_sparse_flow(flow, valid, sx, sy)
            else:
                flow = cv2.resize(flow, None, fx=sx, fy=sy, interpolation=cv2.INTER_LINEAR)
                flow = flow * [sx, sy]
        img1, img2, flow, valid = self._flips(img1, img2, flow, valid, rng)

        if self.sparse and margin_crop:
            # standard sparse path: margin-then-clip crop
            # (SparseFlowAugmentor, augmentor.py:431-438); the WoCrop
            # multi-scale path uses a plain uniform crop (:569-570)
            margin_y, margin_x = 20, 50
            y0 = rng.randint(0, img1.shape[0] - crop[0] + margin_y)
            x0 = rng.randint(-margin_x, img1.shape[1] - crop[1] + margin_x)
            y0 = int(np.clip(y0, 0, img1.shape[0] - crop[0]))
            x0 = int(np.clip(x0, 0, img1.shape[1] - crop[1]))
            y1 = y0
        elif self.sparse:
            y0 = rng.randint(0, img1.shape[0] - crop[0] + 1)
            x0 = rng.randint(0, img1.shape[1] - crop[1] + 1)
            y1 = y0
        elif cfg.yjitter:
            y0 = rng.randint(2, img1.shape[0] - crop[0] - 2)
            x0 = rng.randint(2, img1.shape[1] - crop[1] - 2)
            y1 = y0 + rng.randint(-2, 3)  # imperfect-rectification jitter
        else:
            y0 = rng.randint(0, img1.shape[0] - crop[0])
            x0 = rng.randint(0, img1.shape[1] - crop[1])
            y1 = y0
        img1 = img1[y0 : y0 + crop[0], x0 : x0 + crop[1]]
        img2 = img2[y1 : y1 + crop[0], x0 : x0 + crop[1]]
        flow = flow[y0 : y0 + crop[0], x0 : x0 + crop[1]]
        if valid is not None:
            valid = valid[y0 : y0 + crop[0], x0 : x0 + crop[1]]
        return img1, img2, flow, valid

    # -- entry points ----------------------------------------------- #

    def __call__(
        self,
        img1: np.ndarray,
        img2: np.ndarray,
        flow: np.ndarray,
        valid: Optional[np.ndarray] = None,
        crop_size: Optional[Tuple[int, int]] = None,
        scale_size: Optional[Tuple[int, int]] = None,
        rng: Optional[np.random.RandomState] = None,
    ):
        """crop_size overrides the config crop (multi-scale HR crop);
        scale_size, when given, bicubic-downscales the IMAGES ONLY to the LR
        input size afterwards (the WoCrop behavior, augmentor.py:306-318)."""
        rng = rng or np.random.RandomState()
        crop = tuple(crop_size or self.cfg.crop_size)
        img1, img2 = self.color_transform(img1, img2, rng)
        img1, img2 = self.eraser_transform(img1, img2, rng)
        img1, img2, flow, valid = self.spatial_transform(
            img1, img2, flow, valid, crop, rng,
            margin_crop=scale_size is None,
        )
        if scale_size is not None:
            img1 = cv2.resize(
                img1, dsize=(scale_size[1], scale_size[0]), interpolation=cv2.INTER_CUBIC
            )
            img2 = cv2.resize(
                img2, dsize=(scale_size[1], scale_size[0]), interpolation=cv2.INTER_CUBIC
            )
        out = tuple(
            np.ascontiguousarray(x) for x in (img1, img2, flow)
        )
        if self.sparse:
            return (*out, np.ascontiguousarray(valid))
        return out
