"""Normalized coordinate grids for the implicit decoder.

Spec: reference `make_coord` / `to_pixel_samples`
(models/coreContinuous_IGEV/liif.py:32-45, stereo_datasets.py:18-41).

Convention: normalized coords live in [-1, 1] and are stored in (y, x) order
— axis 0 of an image maps to component 0.  Pixel centers of an axis of length
n sit at  -1 + (2i + 1) / n  for i in [0, n).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _axis_centers(n: int, lo: float = -1.0, hi: float = 1.0) -> jnp.ndarray:
    r = (hi - lo) / (2 * n)
    return lo + r + (2 * r) * jnp.arange(n, dtype=jnp.float32)


def make_coord(
    shape: Sequence[int],
    ranges: Sequence[Tuple[float, float]] | None = None,
    flatten: bool = True,
) -> jnp.ndarray:
    """Pixel-center coordinate grid.

    Returns [H*W, 2] (flatten) or [H, W, 2], components ordered (y, x),
    each in [-1, 1].  Matches liif.py:32-45.
    """
    axes = []
    for i, n in enumerate(shape):
        lo, hi = (-1.0, 1.0) if ranges is None else ranges[i]
        axes.append(_axis_centers(n, lo, hi))
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    if flatten:
        grid = grid.reshape(-1, grid.shape[-1])
    return grid


def make_coord_grid(h: int, w: int) -> jnp.ndarray:
    """[2, H, W] coordinate map of latent pixel centers ((y, x) components),
    the grid the decoder samples `q_coord` from (liif.py:115-116)."""
    return jnp.transpose(make_coord((h, w), flatten=False), (2, 0, 1))


def to_pixel_samples(img_hw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten a [H, W] (or [H, W, C]) map into (coords [H*W, 2], values
    [H*W, C]) query pairs (stereo_datasets.py:35-41)."""
    h, w = img_hw.shape[:2]
    coords = make_coord((h, w), flatten=True)
    vals = img_hw.reshape(h * w, -1)
    return coords, vals
