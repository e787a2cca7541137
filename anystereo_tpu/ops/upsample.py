"""Disparity upsampling: combine the implicit decoder's per-query weights
with a 3x3 neighborhood of the low-res disparity.

Spec: context_upsample* (models/coreContinuous_IGEV/submodule.py:343-398).
The low-res disparity is pre-scaled by 4*scale by the caller
(continuous_IGEVstereo.py:202-206) before being passed here.
"""

from __future__ import annotations

import jax.numpy as jnp

from anystereo_tpu.ops.sampling import nearest_resize, nearest_sample


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 patch extraction with zero padding.

    x: [B, H, W] or [B, H, W, C] → [B, H, W, 9*C]; tap order is kernel
    row-major ((ky,kx) = (-1,-1),(-1,0),...,(1,1)) matching F.unfold for C=1
    (submodule.py:350).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        padded[:, ky : ky + h, kx : kx + w]
        for ky in range(3)
        for kx in range(3)
    ]
    return jnp.concatenate(patches, axis=-1)


def _clamp_coords(coords: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.clip(coords, -1.0 + eps, 1.0 - eps)


def context_upsample_queries(
    disp_low: jnp.ndarray,
    weights: jnp.ndarray,
    coords: jnp.ndarray,
) -> jnp.ndarray:
    """Query-based upsampling (context_upsample_multiscale_train,
    submodule.py:357-372).

    disp_low: [B, H, W] (already scaled by 4*scale)
    weights:  [B, Q, 9] softmaxed decoder output
    coords:   [B, Q, 2] normalized (y, x) queries
    returns   [B, Q]
    """
    patches = unfold3x3(disp_low)  # [B, H, W, 9]
    taps = nearest_sample(patches, _clamp_coords(coords))  # [B, Q, 9]
    return (taps * weights).sum(axis=-1)


def context_upsample_queries_quarter(
    disp_low: jnp.ndarray,
    weights: jnp.ndarray,
    coords: jnp.ndarray,
) -> jnp.ndarray:
    """4-nearest-neighbor variant (context_upsample_multiscale_train_quaterp,
    submodule.py:375-398): sample the four latent pixels at coords ± half a
    cell; weights: [B, Q, 4] ordered (vy,vx) = (-1,-1),(-1,+1),(+1,-1),(+1,+1).
    """
    b, h, w = disp_low.shape
    ry = 1.0 / h  # half a cell in normalized units along y
    rx = 1.0 / w
    eps = 1e-6
    taps = []
    for vy in (-1.0, 1.0):
        for vx in (-1.0, 1.0):
            shifted = coords + jnp.array([vy * ry + eps, vx * rx + eps], coords.dtype)
            taps.append(
                nearest_sample(disp_low[..., None], _clamp_coords(shifted))[..., 0]
            )
    taps = jnp.stack(taps, axis=-1)  # [B, Q, 4]
    return (taps * weights).sum(axis=-1)


def context_upsample(
    disp_low: jnp.ndarray,
    weights: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Fixed-grid upsampling (context_upsample, submodule.py:343-355).

    disp_low: [B, H, W] (already scaled), weights: [B, H', W', 9] with
    (H', W') = (round(4*H*scale), round(4*W*scale)); returns [B, H', W'].
    """
    b, h, w = disp_low.shape
    oh, ow = weights.shape[1], weights.shape[2]
    patches = unfold3x3(disp_low)  # [B, H, W, 9]
    up = nearest_resize(patches, (oh, ow))  # [B, H', W', 9]
    return (up * weights).sum(axis=-1)
