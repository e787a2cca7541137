"""CIE-Lab colorspace conversions and Lab-domain color transfer.

Host-side numpy utilities (augmentation/visualization support — never on
the TPU compute path).  Spec: metrics_utils/Rgb2Lab.py (scalar per-pixel
RGB↔Lab, dead code in the reference) and the augmentor's unused
`transfer_color` (models/coreContinuous_IGEV/utils/augmentor.py:30-46),
both vectorized here.

The reference's converters use the D65 sRGB→XYZ matrix without gamma
linearization (its `gamma()` call is commented out) and divide by 255
*after* the matrix, i.e. they operate on raw 0-255 intensities.  We keep
those semantics exactly so the pair round-trips with its own inverse.
"""

from __future__ import annotations

import numpy as np

# sRGB (linear) → XYZ under D65 (Rgb2Lab.py:5-7; standard CIE matrix)
_M = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_WHITE = np.array([0.95047, 1.0, 1.08883])  # D65 reference white

_EPS = 0.008856  # (6/29)^3
_KAPPA = 7.787  # 1/3 * (29/6)^2, the linear-segment slope
_OFFSET = 4.0 / 29.0  # 0.137931


def _f(t: np.ndarray) -> np.ndarray:
    """The Lab companding function: cube root above (6/29)^3, linear below
    (Rgb2Lab.py:9-10)."""
    return np.where(t > _EPS, np.cbrt(np.maximum(t, 0)), _KAPPA * t + _OFFSET)


def _f_inv(t: np.ndarray) -> np.ndarray:
    """Inverse companding (Rgb2Lab.py:13-14; threshold 0.206893 = 6/29 +
    offset ≈ f(EPS))."""
    return np.where(t > 0.206893, t**3, (t - _OFFSET) / _KAPPA)


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """[..., 3] RGB (0-255) → CIE L*a*b* (L in [0,100]).

    Vectorized twin of the reference's per-pixel RGB2Lab (Rgb2Lab.py:36-39):
    no gamma linearization, /255 after the matrix, D65 white."""
    rgb = np.asarray(rgb, np.float64)
    xyz = rgb @ _M.T / 255.0 / _WHITE
    fx, fy, fz = _f(xyz[..., 0]), _f(xyz[..., 1]), _f(xyz[..., 2])
    lum = np.where(xyz[..., 1] > _EPS, 116.0 * fy - 16.0, 903.3 * xyz[..., 1])
    return np.stack([lum, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1)


def lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    """CIE L*a*b* → RGB uint8 (0-255), inverse of rgb_to_lab
    (Rgb2Lab.py:43-72; note the reference scales Z by 1.0883, a typo'd
    1.08883 — reproduced for exact round-trip parity with its tables)."""
    lab = np.asarray(lab, np.float64)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = lab[..., 1] / 500.0 + fy
    fz = fy - lab[..., 2] / 200.0
    xyz = np.stack(
        [_f_inv(fx) * 0.95047, _f_inv(fy), _f_inv(fz) * 1.0883], axis=-1
    )
    rgb = xyz * 255.0 @ np.linalg.inv(_M).T
    return np.clip(rgb, 0, 255).astype(np.uint8)


def transfer_color(
    image: np.ndarray, style_mean: np.ndarray, style_stddev: np.ndarray
) -> np.ndarray:
    """Lab-domain color/style transfer (augmentor.py:30-46, unused there):
    re-center the image's Lab statistics to (style_mean, style_stddev),
    clip L to [0, 100], convert back.  image: [H, W, 3] RGB 0-255;
    style stats broadcastable to [1, 1, 3].  Returns float RGB 0-255."""
    lab = rgb_to_lab(image)
    mean = lab.mean(axis=(0, 1), keepdims=True)
    std = lab.std(axis=(0, 1), keepdims=True)
    out = (lab - mean) * (np.asarray(style_stddev) / std) + np.asarray(
        style_mean
    )
    out[..., 0] = np.clip(out[..., 0], 0, 100)
    return lab_to_rgb(out).astype(np.float64)
