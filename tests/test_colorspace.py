"""Parity of the vectorized Lab conversions with the reference's scalar
per-pixel converters (metrics_utils/Rgb2Lab.py — dead code there, live
utility here) and round-trip sanity."""

import numpy as np

from anystereo_tpu.utils.colorspace import lab_to_rgb, rgb_to_lab, transfer_color

M = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)


def _f_scalar(c):
    # Rgb2Lab.py:9-10
    return c ** (1 / 3) if c > 0.008856 else 7.787 * c + 0.137931


def _rgb2lab_scalar(r, g, b):
    # Rgb2Lab.py:17-33 — its input is a BGR pixel; math on [r, g, b]
    xyz = M @ np.array([r, g, b]) / 255.0
    x, y, z = xyz[0] / 0.95047, xyz[1] / 1.0, xyz[2] / 1.08883
    fx, fy, fz = _f_scalar(x), _f_scalar(y), _f_scalar(z)
    lum = 116 * fy - 16 if y > 0.008856 else 903.3 * y
    return lum, 500 * (fx - fy), 200 * (fy - fz)


class TestLabConversions:
    def test_matches_reference_scalar_math(self):
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 256, (5, 7, 3)).astype(np.float64)
        got = rgb_to_lab(rgb)
        for i in range(5):
            for j in range(7):
                want = _rgb2lab_scalar(*rgb[i, j])
                np.testing.assert_allclose(got[i, j], want, rtol=1e-9,
                                           atol=1e-9)

    def test_round_trip(self):
        rng = np.random.RandomState(1)
        rgb = rng.randint(20, 236, (16, 16, 3)).astype(np.float64)
        back = lab_to_rgb(rgb_to_lab(rgb)).astype(np.float64)
        # the reference's lab_to_xyz scales Z by 1.0883 (a typo'd 1.08883,
        # reproduced for parity) — small blue-channel drift is expected
        assert np.abs(back - rgb).max() <= 2.0

    def test_white_and_black(self):
        lab = rgb_to_lab(np.array([[255.0, 255.0, 255.0], [0.0, 0.0, 0.0]]))
        assert abs(lab[0, 0] - 100.0) < 0.01  # L* of white
        np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=1e-9)

    def test_transfer_color_moves_statistics(self):
        rng = np.random.RandomState(2)
        img = rng.randint(40, 200, (32, 32, 3)).astype(np.float64)
        style_mean = np.array([[[60.0, 5.0, -5.0]]])
        style_std = np.array([[[12.0, 6.0, 6.0]]])
        out = transfer_color(img, style_mean, style_std)
        assert out.shape == img.shape
        lab = rgb_to_lab(out)
        # uint8 quantization + L clipping leave a small bias
        np.testing.assert_allclose(
            lab.mean(axis=(0, 1)), style_mean[0, 0], atol=2.5
        )
