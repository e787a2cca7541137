"""Occlusion-mask computation by left-right consistency.

Spec: metrics_utils/experiment.py — `warp` (:267-284, disparity-warp of the
right disparity map into the left view via grid_sample) and `occ_mask`
(:286-296: |D_left - warp(D_right)| <= 3 px → non-occluded).  Used by the
SceneFlow validator (evaluation_validate.py:366).
"""

from __future__ import annotations

import jax.numpy as jnp

from anystereo_tpu.ops.sampling import gather_1d_linear


def warp_disparity(right_map: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Sample right_map at x - disp along each row (bilinear, zeros outside).

    right_map, disp: [B, H, W] → [B, H, W].
    """
    b, h, w = disp.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    pos = xs[None, None, :] - disp  # [B, H, W]
    return gather_1d_linear(right_map, pos)


def occ_mask(
    disp_left: jnp.ndarray, disp_right: jnp.ndarray, thresh: float = 3.0
) -> jnp.ndarray:
    """True where OCCLUDED (LR inconsistency > thresh px)."""
    warped = warp_disparity(disp_right, disp_left)
    return jnp.abs(disp_left - warped) > thresh
