"""Correlation / geometry-volume pyramid lookup — the per-iteration gather
that feeds the ConvGRU motion encoder.

Spec: Combined_Geo_Encoding_Volume (models/coreContinuous_IGEV/geometry.py:6-60)
and CorrBlock1D (models/corePrune_RAFT/geometry.py:6-43).  The reference
reshapes to [B*H*W, C, 1, L] rows and calls grid_sample per GRU iteration;
the CUDA extension it ships (sampler/sampler_kernel.cu:19-60, never wired up)
fuses the same gather.  Here the pyramid is built once per forward pass and
the lookup is a vectorized 1-D linear gather over the innermost (lane) axis;
a Pallas kernel (ops/pallas/lookup_kernel.py) implements the fused fast path
behind the same function signature.

Channel ordering: the framework uses an internal, layout-native order —
GEV taps group-major across ALL levels first ([G, levels, K] flattened),
then the init-corr taps ([levels, K] flattened).  This makes every
reshape after the pixel-major Pallas kernel free (the reference's
per-level interleave, geometry.py:57-59, cost a measured ~1.2 ms of XLA
shuffles per GRU iteration at KITTI size).  The consumer is a 1x1 conv,
so the order is an internal representation detail; the reference order is
recovered by `internal_to_reference_perm`, which the checkpoint converter
applies to convc1's input channels (and parity tests apply to outputs).
RAFT mode has no GEV: [levels, K] — identical to the reference order.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from anystereo_tpu.ops.sampling import gather_1d_linear, pool_half_last


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CorrPyramid:
    """Precomputed lookup pyramids.

    corr_levels: tuple of [B, H, W, W2/2^i] all-pairs correlation rows.
    geo_levels:  tuple of [B, H, W, G, D/2^i] geometry-encoding volumes
                 (None for the RAFT core).
    """

    corr_levels: Tuple[jnp.ndarray, ...]
    geo_levels: Optional[Tuple[jnp.ndarray, ...]]
    radius: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_levels(self) -> int:
        return len(self.corr_levels)

    @property
    def out_channels(self) -> int:
        taps = 2 * self.radius + 1
        if self.geo_levels is not None:
            g = self.geo_levels[0].shape[-2]
            return self.num_levels * taps * (g + 1)
        return self.num_levels * taps


def build_pyramid(
    corr: jnp.ndarray,
    geo_volume: Optional[jnp.ndarray],
    num_levels: int,
    radius: int,
) -> CorrPyramid:
    """Build the avg-pooled lookup pyramids (geometry.py:23-29).

    corr:       [B, H, W, W2] all-pairs correlation (fp32)
    geo_volume: [B, H, W, G, D] or None
    Each level halves the last axis (kernel 2 / stride 2, floor semantics).
    """
    corr = corr.astype(jnp.float32)
    corr_levels = [corr]
    for _ in range(num_levels - 1):
        corr_levels.append(pool_half_last(corr_levels[-1]))
    geo_levels = None
    if geo_volume is not None:
        g0 = geo_volume.astype(jnp.float32)
        geo_list = [g0]
        for _ in range(num_levels - 1):
            geo_list.append(pool_half_last(geo_list[-1]))
        geo_levels = tuple(geo_list)
    return CorrPyramid(tuple(corr_levels), geo_levels, radius)


def _gather_window(vol: jnp.ndarray, base: jnp.ndarray, taps: int):
    """Windowed tap gather oracle: out[..., k] = lerp(vol, base + k),
    exploiting the lookup's consecutive-integer tap offsets.  jnp only —
    the production TPU path is the fused transposed pyramid kernel
    dispatched directly in pyramid_lookup (impl=='pallas' early-returns
    there); the single-level gather_window_linear kernel stays available
    in ops/pallas with its own parity tests."""
    pos = base[..., None] + jnp.arange(taps, dtype=jnp.float32)
    return gather_1d_linear(vol, pos)


_IMPL_OVERRIDE: Optional[Tuple[str, bool]] = None  # (impl, interpret)


def set_impl_override(impl: Optional[str], interpret: bool = False):
    """Force the lookup implementation globally — (impl, interpret) or None
    to restore backend-based dispatch.  Lets tests and dryrun_multichip run
    the Pallas kernels in interpret mode on the virtual CPU mesh, so the
    path that executes on real multi-chip TPU hardware is the one tested."""
    global _IMPL_OVERRIDE
    _IMPL_OVERRIDE = None if impl is None else (impl, interpret)


def _default_impl() -> Tuple[str, bool]:
    import os

    import jax

    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    # diagnostic escape hatch: force an implementation without code changes
    # (e.g. ANYSTEREO_LOOKUP_IMPL=jnp to A/B the Pallas path on TPU)
    env = os.environ.get("ANYSTEREO_LOOKUP_IMPL")
    if env:
        return env, False
    return ("pallas" if jax.default_backend() == "tpu" else "jnp"), False


def pyramid_lookup(
    pyr: CorrPyramid,
    disp: jnp.ndarray,
    coords: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
    split: bool = False,
    out_dtype=None,
):
    """Sample 2r+1 taps around the current disparity at every pyramid level.

    disp:   [B, H, W] current disparity estimate (fp32; callers stop_gradient
            it between GRU iterations as the reference does at
            continuous_IGEVstereo.py:285).
    coords: [B, H, W] or [W] x-coordinate of each column (defaults to
            arange(W); an explicit value supports spatially-sharded tiles
            whose global offset differs).
    split:  return the per-volume parts as a tuple ((geo, corr) for IGEV,
            (corr,) for RAFT) instead of concatenating — lets the motion
            encoder contract each part against a slice of its 1x1 conv
            kernel, skipping the per-GRU-iteration concat materialization.
    out_dtype: cast the result to this dtype (the Pallas aligned kernel
            rounds at its final store, eliding the XLA-side cast; the
            interpolation math stays fp32 in every impl).  None = fp32.
    returns [B, H, W, C_lookup] (or the split tuple).

    Tap positions (geometry.py:41-53):
      GEV:  x0 = disp / 2^i + dx,          sampled from the D axis;
      corr: x0 = (coords - disp) / 2^i + dx, sampled from the W2 axis.
    """
    b, h, w = disp.shape
    r = pyr.radius
    k = 2 * r + 1
    n_lvl = pyr.num_levels
    interpret = False
    if impl is None:
        impl, interpret = _default_impl()
    disp = disp.astype(jnp.float32)
    if coords is None:
        coords = jnp.arange(w, dtype=jnp.float32)
    coords = jnp.broadcast_to(coords, (b, h, w)).astype(jnp.float32)
    out_name = jnp.dtype(out_dtype or jnp.float32).name

    def _finish(parts):
        parts = [
            p if p.dtype == jnp.dtype(out_name) else p.astype(out_name)
            for p in parts
        ]
        if split:
            return tuple(parts)
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    if impl == "pallas":
        # fused transposed kernel with pixel-major output: one call per
        # volume computes every pyramid level from the level-0 rows (the
        # pooled arrays in `pyr` are never read and get DCE'd under jit).
        # The kernel takes the volume disparity-major ([L, R], pixels on
        # the TPU lane axis) — that transpose is loop-invariant w.r.t.
        # the GRU iteration so XLA's while-loop LICM hoists it out of the
        # scan — and emits [R, levels*K] so the reshapes below move no
        # data (internal channel order; see module docstring).
        # Two kernel flavors (ANYSTEREO_LOOKUP_KERNEL=aligned|classify):
        # "aligned" (default) barrel-rolls each column to its window start
        # so taps become static rows (~3-4x fewer VPU ops); "classify" is
        # the original per-slot masked-select kernel kept for A/B.
        import os

        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
            gather_pyramid_window_pm,
        )

        flavor = os.environ.get("ANYSTEREO_LOOKUP_KERNEL", "aligned")
        out = []
        if flavor == "aligned":
            if pyr.geo_levels is not None:
                geo0 = pyr.geo_levels[0]  # [B, H, W, G, D]
                g = geo0.shape[-2]
                x_g = jnp.broadcast_to(
                    disp[..., None], (b, h, w, g)
                ).reshape(-1)
                geo_pm = gather_pyramid_aligned_pm(
                    geo0.reshape(-1, geo0.shape[-1]).T, x_g, k, n_lvl,
                    interpret, out_name,
                )  # [B*H*W*G, levels*K], rows (pixel, g)-major
                out.append(geo_pm.reshape(b, h, w, g * n_lvl * k))
            corr0 = pyr.corr_levels[0]
            corr_pm = gather_pyramid_aligned_pm(
                corr0.reshape(-1, corr0.shape[-1]).T,
                (coords - disp).reshape(-1), k, n_lvl, interpret, out_name,
            )  # [B*H*W, levels*K]
            out.append(corr_pm.reshape(b, h, w, n_lvl * k))
            return _finish(out)

        scales = jnp.asarray([2.0**-i for i in range(n_lvl)], jnp.float32)
        if pyr.geo_levels is not None:
            geo0 = pyr.geo_levels[0]  # [B, H, W, G, D]
            g = geo0.shape[-2]
            bases = disp[..., None] * scales - r  # [B, H, W, levels]
            bases_g = jnp.broadcast_to(
                bases[..., None, :], (b, h, w, g, n_lvl)
            ).reshape(-1, n_lvl)
            geo_pm = gather_pyramid_window_pm(
                geo0.reshape(-1, geo0.shape[-1]).T, bases_g.T, k, interpret
            )  # [B*H*W*G, levels*K], rows (pixel, g)-major
            out.append(geo_pm.reshape(b, h, w, g * n_lvl * k))
        corr0 = pyr.corr_levels[0]
        cbases = ((coords - disp)[..., None] * scales - r).reshape(-1, n_lvl)
        corr_pm = gather_pyramid_window_pm(
            corr0.reshape(-1, corr0.shape[-1]).T, cbases.T, k, interpret
        )  # [B*H*W, levels*K]
        out.append(corr_pm.reshape(b, h, w, n_lvl * k))
        return _finish(out)

    out = []
    if pyr.geo_levels is not None:
        g = pyr.geo_levels[0].shape[-2]
        geo_taps = []
        for i in range(n_lvl):
            scale = 1.0 / (2.0**i)
            geo = pyr.geo_levels[i]  # [B, H, W, G, Di]
            base = disp * scale - r  # tap k sits at base + k (dx = -r..r)
            base_g = jnp.broadcast_to(base[..., None], (b, h, w, g))
            geo_taps.append(_gather_window(geo, base_g, k))  # [B,H,W,G,K]
        # internal order: [G, levels, K] flattened (group-major)
        out.append(jnp.stack(geo_taps, axis=-2).reshape(b, h, w, g * n_lvl * k))
    corr_taps = []
    for i in range(n_lvl):
        scale = 1.0 / (2.0**i)
        corr = pyr.corr_levels[i]  # [B, H, W, W2i]
        cbase = (coords - disp) * scale - r
        corr_taps.append(_gather_window(corr, cbase, k))  # [B, H, W, K]
    out.append(
        jnp.concatenate(corr_taps, axis=-1)
        if len(corr_taps) > 1
        else corr_taps[0]
    )
    return _finish(out)


def lookup_channels(num_levels: int, radius: int, groups: Optional[int]) -> int:
    taps = 2 * radius + 1
    if groups is not None:
        return num_levels * taps * (groups + 1)
    return num_levels * taps


def internal_to_reference_perm(
    num_levels: int, radius: int, groups: Optional[int]
):
    """Index map from this framework's lookup channel order to the
    reference's (geometry.py:57-59).

    perm[i] = reference channel index of internal channel i, so
    `out_internal[..., c] == out_reference[..., perm[c]]` and a torch
    convc1 kernel converts as `kernel_hwio[:, :, perm, :]` (the converter
    gathers the reference's input channels into internal positions).
    Internal: geo [G, levels, K] flattened, then corr [levels, K].
    Reference: per level, geo [G, K] then corr [K].  Identity when
    groups is None (RAFT: both orders are [levels, K])."""
    import numpy as np

    k = 2 * radius + 1
    if groups is None:
        return np.arange(num_levels * k)
    perm = np.empty(num_levels * k * (groups + 1), np.int64)
    i = 0
    for g in range(groups):
        for lvl in range(num_levels):
            for kk in range(k):
                perm[i] = lvl * (groups + 1) * k + g * k + kk
                i += 1
    for lvl in range(num_levels):
        for kk in range(k):
            perm[i] = lvl * (groups + 1) * k + groups * k + kk
            i += 1
    return perm
