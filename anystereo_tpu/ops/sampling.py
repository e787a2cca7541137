"""Sampling / interpolation primitives.

These are pure-jnp reference implementations (CPU-runnable, used as oracles
for the Pallas kernels).  Semantics are pinned to the reference's use of
torch.nn.functional.grid_sample:

* `gather_1d_linear` — the stereo-specialized bilinear sampler
  (models/coreContinuous_IGEV/utils/utils.py:59-73): positions ARE pixel
  indices (align_corners=True maps [-1,1] → [0, L-1]), out-of-range taps
  contribute zero.
* `nearest_sample` — grid_sample(mode='nearest', align_corners=False) used by
  the LIIF query samplers (liif.py:122-125).
* `interp_bilinear` — F.interpolate(mode='bilinear', align_corners=True) used
  between GRU levels (update.py:100-102), expressed as two small dense
  matmuls so it rides the MXU instead of emitting gathers.
* `avg_pool2d` — F.avg_pool2d with count_include_pad=True (torch default),
  used by pool2x/pool4x (update.py:94-98).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def gather_1d_linear(vol: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linearly interpolate `vol` along its last axis at fractional `pos`.

    vol: [..., L]   (leading dims = batch dims, must match pos's)
    pos: [..., K]   fractional positions in pixel units
    returns [..., K]; taps outside [0, L-1] contribute zero
    (grid_sample zero padding, utils/utils.py:69).
    """
    L = vol.shape[-1]
    x0f = jnp.floor(pos)
    w1 = (pos - x0f).astype(vol.dtype)
    i0 = x0f.astype(jnp.int32)
    i1 = i0 + 1
    valid0 = ((i0 >= 0) & (i0 <= L - 1)).astype(vol.dtype)
    valid1 = ((i1 >= 0) & (i1 <= L - 1)).astype(vol.dtype)
    v0 = jnp.take_along_axis(vol, jnp.clip(i0, 0, L - 1), axis=-1)
    v1 = jnp.take_along_axis(vol, jnp.clip(i1, 0, L - 1), axis=-1)
    return v0 * valid0 * (1.0 - w1) + v1 * valid1 * w1


def _nearest_indices(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map a normalized coord in [-1,1] to its nearest pixel index, with
    grid_sample's align_corners=False unnormalization ((c+1)*n - 1) / 2 and
    round-half-to-even (std::nearbyint), then clamp."""
    ix = ((c + 1.0) * n - 1.0) * 0.5
    return jnp.clip(jnp.round(ix).astype(jnp.int32), 0, n - 1)


# -- query-gather implementation dispatch (mirrors ops/lookup.py) -- #
_GATHER_OVERRIDE: Optional[Tuple[str, bool]] = None  # (impl, interpret)

# the Pallas kernel holds the whole table in VMEM; beyond this it cannot
# run (and the latent tables this op exists for are far smaller)
_PALLAS_TABLE_BYTES_MAX = 6 * 1024 * 1024


def set_gather_override(impl: Optional[str], interpret: bool = False):
    """Force the query-gather implementation globally — "jnp" / "pallas",
    or None to restore auto dispatch (test/benchmark hook)."""
    global _GATHER_OVERRIDE
    _GATHER_OVERRIDE = None if impl is None else (impl, interpret)


def _gather_impl(
    table_bytes: int, rows: int, channels: int
) -> Tuple[str, bool]:
    if _GATHER_OVERRIDE is not None:
        return _GATHER_OVERRIDE
    env = os.environ.get("ANYSTEREO_GATHER_IMPL")
    if env:
        if env not in ("jnp", "pallas", "hybrid"):
            raise ValueError(
                f"ANYSTEREO_GATHER_IMPL={env!r}: expected jnp|pallas|hybrid"
            )
        # Pallas paths only run compiled on TPU; elsewhere fall back to
        # interpret mode so the override stays usable in CPU tests.
        return env, jax.default_backend() != "tpu"
    # On-chip A/B (tools/kbench_gather.py, 2026-08-20, fwd+bwd at training
    # shapes): XLA's DMA-driven row gather beats the one-hot MXU
    # formulation FORWARD at every production shape, and its scatter-add
    # transpose is competitive for wide tables — but for NARROW small-N
    # tables (the 9-tap disparity rows) the XLA scatter is pathological
    # (0.78 ms vs 0.16 ms) and the hybrid (XLA fwd + Pallas one-hot-matmul
    # bwd) wins 1.4x end-to-end.  Everything else stays jnp: the one-hot
    # route spends Q*N*C MACs for Q*C useful values, which only pays where
    # XLA's transpose is that bad.
    if (
        jax.default_backend() == "tpu"
        and table_bytes <= _PALLAS_TABLE_BYTES_MAX
        and rows <= 4096
        and channels <= 16
    ):
        return "hybrid", False
    return "jnp", False


def gather_rows_flat(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, q] = flat[b, idx[b, q]] — batched row gather with impl
    dispatch: the Pallas MXU one-hot-tile kernel on TPU (VMEM-resident
    table, scatter-add-as-matmul backward — ops/pallas/gather_kernel.py),
    a vmapped jnp.take elsewhere (take_along_axis with a broadcast
    trailing index lowers to Q*C scalar gathers on TPU, measured ~1000x
    slower at decode sizes).

    flat: [B, N, C]; idx: [B, Q] int32 → [B, Q, C]
    """
    impl, interpret = _gather_impl(
        flat.shape[1] * flat.shape[2] * flat.dtype.itemsize,
        flat.shape[1],
        flat.shape[2],
    )
    if impl == "pallas":
        from anystereo_tpu.ops.pallas.gather_kernel import gather_rows

        return gather_rows(flat, idx, interpret)
    if impl == "hybrid":
        from anystereo_tpu.ops.pallas.gather_kernel import gather_rows_hybrid

        return gather_rows_hybrid(flat, idx, interpret)
    return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(flat, idx)


def nearest_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample of an NHWC map at normalized (y, x) queries.

    feat:   [B, H, W, C]
    coords: [B, Q, 2] in [-1, 1], (y, x) order
    returns [B, Q, C]
    """
    _, h, w, _ = feat.shape
    iy = _nearest_indices(coords[..., 0], h)  # [B, Q]
    ix = _nearest_indices(coords[..., 1], w)
    flat = feat.reshape(feat.shape[0], h * w, feat.shape[-1])
    idx = iy * w + ix
    return gather_rows_flat(flat, idx)


def nearest_dense_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Separable nearest gather of a dense NHWC map at normalized axis
    grids — the gather-free form used by the dense eval decode (one-hot
    rows contract on the MXU instead of per-query scalar gathers).

    x:  [B, h, w, C]; ys: [H'] / xs: [W'] in [-1, 1]
    returns (out [B, H', W', C], iy [H'] int32, ix [W'] int32) where
    iy/ix are the gathered source indices (for rel-coord computation).
    """
    h, w = x.shape[1], x.shape[2]
    iy = _nearest_indices(jnp.clip(ys, -1 + 1e-6, 1 - 1e-6), h)
    ix = _nearest_indices(jnp.clip(xs, -1 + 1e-6, 1 - 1e-6), w)
    mh = jax.nn.one_hot(iy, h, dtype=x.dtype)  # [H', h]
    mw = jax.nn.one_hot(ix, w, dtype=x.dtype)  # [W', w]
    out = jnp.einsum("yh,bhwc->bywc", mh, x)
    out = jnp.einsum("xw,bywc->byxc", mw, out)  # [B, H', W', C]
    return out, iy, ix


def nearest_latent_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Normalized pixel-center coordinates of the latent cell each query
    lands in — equal to nearest-sampling a make_coord grid (liif.py:124-125)
    but computed in closed form."""
    iy = _nearest_indices(coords[..., 0], h)
    ix = _nearest_indices(coords[..., 1], w)
    qy = -1.0 + (2.0 * iy.astype(coords.dtype) + 1.0) / h
    qx = -1.0 + (2.0 * ix.astype(coords.dtype) + 1.0) / w
    return jnp.stack([qy, qx], axis=-1)


def _linear_resize_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] row-stochastic matrix performing 1-D linear interpolation
    with align_corners=True endpoints."""
    if n_out == 1:
        pos = jnp.zeros((1,), jnp.float32)
    else:
        pos = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
    frac = pos - i0.astype(jnp.float32)
    lo = jax.nn.one_hot(i0, n_in, dtype=jnp.float32)
    hi = jax.nn.one_hot(jnp.minimum(i0 + 1, n_in - 1), n_in, dtype=jnp.float32)
    return ((1.0 - frac)[:, None] * lo + frac[:, None] * hi).astype(dtype)


def interp_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize of an NHWC tensor via two dense
    matmuls (MXU-friendly; the maps involved are small GRU feature maps)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    mh = _linear_resize_matrix(h, oh, x.dtype)
    mw = _linear_resize_matrix(w, ow, x.dtype)
    # full precision: interpolation weights must not round to bf16
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=lax.Precision.HIGHEST)
    return jnp.einsum("pw,bowc->bopc", mw, y, precision=lax.Precision.HIGHEST)


def nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch F.interpolate mode='nearest': src = floor(dst*scale))."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def avg_pool2d(
    x: jnp.ndarray,
    window: int,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """F.avg_pool2d on NHWC with count_include_pad=True (torch default —
    border windows divide by the full window area)."""
    # NOTE: init must be a Python scalar so JAX dispatches to the
    # differentiable reduce_window_sum primitive (a traced zero falls back to
    # generic reduce_window, which has no transpose rule).
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (summed / (window * window)).astype(x.dtype)


def pool_half_last(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool with kernel 2 / stride 2 along the LAST axis (the reference's
    F.avg_pool2d(v, [1,2], stride=[1,2]) pyramid builder, geometry.py:24-28).
    Odd trailing elements are dropped (floor semantics)."""
    L = x.shape[-1]
    L2 = L // 2
    x = x[..., : 2 * L2]
    return x.reshape(*x.shape[:-1], L2, 2).mean(axis=-1)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) on NHWC → [B, 1, 1, C] (submodule.py:199)."""
    return x.mean(axis=(1, 2), keepdims=True)
