"""Pallas TPU kernel for the correlation / GEV pyramid lookup.

Role: the per-GRU-iteration gather of 2r+1 linear-interpolated taps from
each pixel's correlation row (and GEV row) — the operation the reference
ships a CUDA extension for (sampler/sampler_kernel.cu:19-60, one thread per
pixel accumulating a 1-D bilinear window) and actually runs as grid_sample
(geometry.py:47,54).

TPU formulation: per-lane dynamic gathers don't vectorize, so each tap is
computed as a masked lane-reduction — weight w_l = (l==floor(p))·(1-f) +
(l==floor(p)+1)·f against the row resident in VMEM, summed over the lane
axis.  Out-of-range taps contribute zero exactly like grid_sample's zero
padding (no lane matches), and the padded lane region is masked out.
The backward pass is the transpose scatter with the same masks (the CUDA
kernel's backward, sampler_kernel.cu:63-105), as a custom_vjp; positions
are non-differentiable, matching the reference's detached-disparity lookup
(continuous_IGEVstereo.py:285).

Exposed as `gather_rows_linear(vol [R, L], pos [R, K]) → [R, K]`, the
row-major twin of ops.sampling.gather_1d_linear (which is its numerical
oracle in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic; interpret mode works on CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    return _HAS_PALLAS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(vol_ref, pos_ref, out_ref, *, length: int, taps: int):
    vol = vol_ref[:]  # [TR, Lpad] fp32
    lane = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 1)
    in_row = lane < length
    for k in range(taps):
        p = pos_ref[:, k][:, None]  # [TR, 1]
        i0 = jnp.floor(p)
        frac = (p - i0).astype(vol.dtype)
        i0i = i0.astype(jnp.int32)
        w = jnp.where((lane == i0i) & in_row, 1.0 - frac, 0.0) + jnp.where(
            (lane == i0i + 1) & in_row, frac, 0.0
        )
        out_ref[:, k] = jnp.sum(vol * w, axis=1)


def _bwd_kernel(pos_ref, g_ref, dvol_ref, *, length: int, taps: int):
    shape = dvol_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    in_row = lane < length
    acc = jnp.zeros(shape, dvol_ref.dtype)
    for k in range(taps):
        p = pos_ref[:, k][:, None]
        i0 = jnp.floor(p)
        frac = (p - i0).astype(acc.dtype)
        i0i = i0.astype(jnp.int32)
        g = g_ref[:, k][:, None]
        acc = acc + g * (
            jnp.where((lane == i0i) & in_row, 1.0 - frac, 0.0)
            + jnp.where((lane == i0i + 1) & in_row, frac, 0.0)
        )
    dvol_ref[:] = acc


_ROW_TILE = 256


def _pallas_fwd(vol: jnp.ndarray, pos: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    r, length = vol.shape
    taps = pos.shape[1]
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    vol_p = jnp.pad(vol.astype(jnp.float32), ((0, rpad - r), (0, lpad - length)))
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    grid = (rpad // _ROW_TILE,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, length=length, taps=taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, taps), jnp.float32),
        interpret=interpret,
    )(vol_p, pos_p)
    return out[:r]


def _pallas_bwd(pos: jnp.ndarray, g: jnp.ndarray, length: int, interpret: bool):
    r, taps = pos.shape
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    grid = (rpad // _ROW_TILE,)
    dvol = pl.pallas_call(
        functools.partial(_bwd_kernel, length=length, taps=taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, lpad), jnp.float32),
        interpret=interpret,
    )(pos_p, g_p)
    return dvol[:r, :length]


# ----------------------------------------------------------------- #
# windowed variant: taps at consecutive integer offsets from one base
# position per row (pos_k = base + k) — the actual pyramid-lookup
# structure (dx = -r..r).  floor(base + k) = floor(base) + k, so the
# fractional weight is shared by all taps and K+1 single-mask lane sums
# s_k = vol[floor(base)+k] produce out_k = (1-f)·s_k + f·s_{k+1}
# (~45% less VPU work than 2K masked sums).
# ----------------------------------------------------------------- #


def _win_fwd_kernel(vol_ref, base_ref, out_ref, *, length: int, taps: int):
    vol = vol_ref[:]  # [TR, Lpad]
    lane = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 1)
    in_row = lane < length
    base = base_ref[:, 0][:, None]
    i0 = jnp.floor(base)
    frac = (base - i0).astype(vol.dtype)
    i0i = i0.astype(jnp.int32)
    prev = None
    for k in range(taps + 1):
        s_k = jnp.sum(
            jnp.where((lane == i0i + k) & in_row, vol, 0.0), axis=1, keepdims=True
        )  # [TR, 1]
        if prev is not None:
            out_ref[:, k - 1] = ((1.0 - frac) * prev + frac * s_k)[:, 0]
        prev = s_k


def _win_bwd_kernel(base_ref, g_ref, dvol_ref, *, length: int, taps: int):
    shape = dvol_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    in_row = lane < length
    base = base_ref[:, 0][:, None]
    i0 = jnp.floor(base)
    frac = (base - i0).astype(dvol_ref.dtype)
    i0i = i0.astype(jnp.int32)
    acc = jnp.zeros(shape, dvol_ref.dtype)
    for j in range(taps + 1):
        coeff = jnp.zeros_like(frac)
        if j < taps:
            coeff = coeff + (1.0 - frac) * g_ref[:, j][:, None]
        if j >= 1:
            coeff = coeff + frac * g_ref[:, j - 1][:, None]
        acc = acc + jnp.where((lane == i0i + j) & in_row, coeff, 0.0)
    dvol_ref[:] = acc


def _win_pallas_fwd(vol, base, taps: int, interpret: bool):
    r, length = vol.shape
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    vol_p = jnp.pad(vol.astype(jnp.float32), ((0, rpad - r), (0, lpad - length)))
    base_p = jnp.pad(base.astype(jnp.float32).reshape(-1, 1), ((0, rpad - r), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_win_fwd_kernel, length=length, taps=taps),
        grid=(rpad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, taps), jnp.float32),
        interpret=interpret,
    )(vol_p, base_p)
    return out[:r]


def _win_pallas_bwd(base, g, length: int, interpret: bool):
    r, taps = g.shape
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    base_p = jnp.pad(base.astype(jnp.float32).reshape(-1, 1), ((0, rpad - r), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    dvol = pl.pallas_call(
        functools.partial(_win_bwd_kernel, length=length, taps=taps),
        grid=(rpad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, lpad), jnp.float32),
        interpret=interpret,
    )(base_p, g_p)
    return dvol[:r, :length]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_window_linear(
    vol: jnp.ndarray, base: jnp.ndarray, taps: int, interpret: bool = False
):
    """out[r, k] = lerp(vol[r], base[r] + k) for k in [0, taps); zero outside
    [0, L-1].  vol: [R, L], base: [R] → [R, taps] fp32.  Positions are
    non-differentiable (detached-disparity lookup)."""
    return _win_pallas_fwd(vol, base, taps, interpret)


def _gwl_fwd(vol, base, taps, interpret):
    return _win_pallas_fwd(vol, base, taps, interpret), (base, vol.shape[1])


def _gwl_bwd(taps, interpret, res, g):
    base, length = res
    return _win_pallas_bwd(base, g, length, interpret), None


gather_window_linear.defvjp(_gwl_fwd, _gwl_bwd)


# Performance notes (measured on v5e, 384x1248 IGEV, 2026-08-17):
#   - XLA take_along_axis lookup: ~175 ms/GRU-iter (per-element scalar
#     gathers).  Masked-lane-reduction kernels: ~7 ms/iter, of which the
#     GEV volume dominates (240k rows x 128 padded lanes; D=48 wastes
#     2.7x lane width).  The windowed form (shared fractional weight,
#     K+1 single-mask sums) and the fused multi-level form (below) are
#     each ~equal-compute but remove HBM traffic and grid overhead.
#   - Further headroom for round 2: the kernel runs at ~0.5 T lane-ops/s
#     (~2-3x off VPU peak).  Packing two G-rows per 128-lane row does NOT
#     help (mask-sum work scales with lanes x sums, and sums double).  A
#     formulation that shares the per-pixel tap weights across the G axis
#     (out[g,k] = vol[g,:] @ w[:,k]) maps to per-sublane small matmuls the
#     MXU can't batch; the remaining levers are narrower row tiles with
#     better pipelining, bf16 row storage, and merging the corr+GEV calls.

# ----------------------------------------------------------------- #
# fused multi-level pyramid lookup: all avg-pooled pyramid levels are
# derived IN-KERNEL from the level-0 row.  Level-i's pooled value
# P_i[j] = mean(row[j·2^i : (j+1)·2^i]), so a level-i tap is a masked
# lane sum with the comparison (lane >> i == index), scaled by 2^-i —
# no pooled arrays in HBM, one kernel per volume instead of one per
# level (halves lookup bandwidth; build_pyramid's pooled levels get
# DCE'd when this path is used).
# ----------------------------------------------------------------- #


def _pyr_fwd_kernel(vol_ref, bases_ref, out_ref, *, length: int, taps: int,
                    levels: int):
    vol = vol_ref[:]  # [TR, Lpad]
    lane = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 1)
    for lvl in range(levels):
        l_i = length >> lvl  # floor(L / 2^i) — truncating pool semantics
        valid = lane < (l_i << lvl)
        lane_i = jax.lax.shift_right_logical(lane, lvl)
        inv = jnp.float32(1.0 / (1 << lvl))
        base = bases_ref[:, lvl][:, None]
        i0 = jnp.floor(base)
        frac = (base - i0).astype(vol.dtype)
        i0i = i0.astype(jnp.int32)
        prev = None
        for k in range(taps + 1):
            s_k = jnp.sum(
                jnp.where((lane_i == i0i + k) & valid, vol, 0.0),
                axis=1,
                keepdims=True,
            ) * inv
            if prev is not None:
                out_ref[:, lvl * taps + k - 1] = (
                    (1.0 - frac) * prev + frac * s_k
                )[:, 0]
            prev = s_k


def _pyr_bwd_kernel(bases_ref, g_ref, dvol_ref, *, length: int, taps: int,
                    levels: int):
    shape = dvol_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    acc = jnp.zeros(shape, dvol_ref.dtype)
    for lvl in range(levels):
        l_i = length >> lvl
        valid = lane < (l_i << lvl)
        lane_i = jax.lax.shift_right_logical(lane, lvl)
        inv = jnp.float32(1.0 / (1 << lvl))
        base = bases_ref[:, lvl][:, None]
        i0 = jnp.floor(base)
        frac = (base - i0).astype(acc.dtype)
        i0i = i0.astype(jnp.int32)
        for j in range(taps + 1):
            coeff = jnp.zeros_like(frac)
            if j < taps:
                coeff = coeff + (1.0 - frac) * g_ref[:, lvl * taps + j][:, None]
            if j >= 1:
                coeff = coeff + frac * g_ref[:, lvl * taps + j - 1][:, None]
            acc = acc + jnp.where((lane_i == i0i + j) & valid, coeff * inv, 0.0)
    dvol_ref[:] = acc


def _pyr_pallas_fwd(vol, bases, taps: int, interpret: bool):
    r, length = vol.shape
    levels = bases.shape[1]
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    vol_p = jnp.pad(vol.astype(jnp.float32), ((0, rpad - r), (0, lpad - length)))
    bases_p = jnp.pad(bases.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_pyr_fwd_kernel, length=length, taps=taps, levels=levels),
        grid=(rpad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, levels), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, levels * taps), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, levels * taps), jnp.float32),
        interpret=interpret,
    )(vol_p, bases_p)
    return out[:r]


def _pyr_pallas_bwd(bases, g, length: int, interpret: bool):
    r, lk = g.shape
    levels = bases.shape[1]
    taps = lk // levels
    lpad = _round_up(max(length, 128), 128)
    rpad = _round_up(max(r, 8), _ROW_TILE)
    bases_p = jnp.pad(bases.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    dvol = pl.pallas_call(
        functools.partial(_pyr_bwd_kernel, length=length, taps=taps, levels=levels),
        grid=(rpad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, levels), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_TILE, levels * taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, lpad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, lpad), jnp.float32),
        interpret=interpret,
    )(bases_p, g_p)
    return dvol[:r, :length]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_pyramid_window(
    vol: jnp.ndarray, bases: jnp.ndarray, taps: int, interpret: bool = False
):
    """Multi-level windowed lookup from the level-0 rows only.

    vol: [R, L]; bases: [R, levels] (per-level window start, in that
    level's pooled units) → [R, levels*taps] fp32 with level-major tap
    blocks.  Level i reads the avg-pool-by-2^i of vol (floor-truncation
    semantics, geometry.py:24-28), computed in-kernel."""
    return _pyr_pallas_fwd(vol, bases, taps, interpret)


def _gpw_fwd(vol, bases, taps, interpret):
    return _pyr_pallas_fwd(vol, bases, taps, interpret), (bases, vol.shape[1])


def _gpw_bwd(taps, interpret, res, g):
    bases, length = res
    return _pyr_pallas_bwd(bases, g, length, interpret), None


gather_pyramid_window.defvjp(_gpw_fwd, _gpw_bwd)


# ----------------------------------------------------------------- #
# transposed multi-level lookup: PIXELS on the lane axis, disparity on
# the sublane axis.  The masked-lane-reduction kernels above spend
# ~25 vector-ops per row (each tap is a full cross-lane reduction and
# the 48-entry GEV row wastes 2.7x of the 128-lane width); here every
# op is elementwise on full 8x128 vregs: iterate d in sublane blocks
# of 8, classify each d into its tap slot t = (d >> lvl) - floor(base)
# per lane, and select-accumulate into taps+1 registers.  No
# reductions until one log2(8) sublane fold per tap at the end.
# ~2.4 vector-ops per pixel for the GEV volume (~9x less VPU work),
# and padding waste is gone.  Same math as gather_pyramid_window.
# ----------------------------------------------------------------- #

_PIX_TILE = 256  # lanes-axis pixels per grid step (fixed-tile kernels)


def _pix_tile(dpad: int, n_bufs: int = 1) -> int:
    """Lanes-axis tile for the transposed kernels, sized so each grid step
    streams ~2 MiB of volume per buffer: a shallow volume (GEV, D=48)
    would otherwise shred 240k pixel columns into ~1000 tiny [48, 256]
    blocks and go grid-overhead-bound (~2 us/step dominated the measured
    2 ms/iter), while a deep one (all-pairs corr at Middlebury width)
    must stay within VMEM.

    ANYSTEREO_LOOKUP_TILE (env, multiple of 128) overrides the heuristic
    for on-chip sweeps — the taps+1 masked accumulators are [8, tile]
    each, so the tile also sets the kernel's live register/VMEM working
    set (tools/profile_iter.py measures the effect)."""
    import os

    override = int(os.environ.get("ANYSTEREO_LOOKUP_TILE", "0"))
    if override:
        if override % 128 != 0 or override <= 0:
            raise ValueError(
                f"ANYSTEREO_LOOKUP_TILE={override} must be a positive "
                "multiple of 128 (lanes axis)"
            )
        return override
    target = (2 * 1024 * 1024) // (4 * dpad * n_bufs)
    return max(256, min(4096, (target // 128) * 128))


def _pyr_t_fwd_kernel(vol_ref, bases_ref, out_ref, *, length: int, taps: int,
                      levels: int, pixel_major: bool):
    """Shared body for the row-major ([levels*taps, tile] out) and
    pixel-major ([tile, levels*taps] out, transposed in-VMEM) variants —
    identical tap-slot classification and pool-validity math."""
    nblk = (length + 7) // 8
    rows = []
    for lvl in range(levels):
        l_i = length >> lvl  # truncating pool semantics
        valid_len = l_i << lvl
        inv = jnp.float32(1.0 / (1 << lvl))
        base = bases_ref[lvl:lvl + 1, :]  # [1, P]
        i0 = jnp.floor(base)
        frac = base - i0  # [1, P]
        i0i = i0.astype(jnp.int32)

        def body(i, s, i0i=i0i, valid_len=valid_len, lvl=lvl):
            d0 = i * 8
            v8 = vol_ref[pl.ds(d0, 8), :]  # [8, P]
            dvec = jax.lax.broadcasted_iota(jnp.int32, v8.shape, 0) + d0
            # tap slot per element; -1 marks rows past the level's pool range
            t = jnp.where(dvec < valid_len, (dvec >> lvl) - i0i, -1)
            return tuple(
                s[m] + jnp.where(t == m, v8, 0.0) for m in range(taps + 1)
            )

        s0 = tuple(
            jnp.zeros((8, vol_ref.shape[1]), jnp.float32)
            for _ in range(taps + 1)
        )
        s = jax.lax.fori_loop(0, nblk, body, s0)
        pooled = [jnp.sum(sm, axis=0, keepdims=True) * inv for sm in s]
        for k in range(taps):
            row = (1.0 - frac) * pooled[k] + frac * pooled[k + 1]
            if pixel_major:
                rows.append(row)
            else:
                out_ref[lvl * taps + k:lvl * taps + k + 1, :] = row
    if pixel_major:
        res = jnp.concatenate(rows, axis=0)  # [levels*taps, tile]
        out_ref[:, :] = jnp.swapaxes(res, 0, 1)


def _pyr_t_bwd_kernel(bases_ref, g_ref, dvol_ref, *, length: int, taps: int,
                      levels: int, pixel_major: bool):
    nblk = (length + 7) // 8
    g_t = g_ref[:, :]  # [levels*taps, tile] (pm: [tile, levels*taps])
    if pixel_major:
        g_t = jnp.swapaxes(g_t, 0, 1)
    # per-level tap-slot gradient coefficients c_m = (1-f)·g_m + f·g_{m-1}
    coeffs = []  # [levels][taps+1] of [1, P]
    i0s = []
    for lvl in range(levels):
        inv = jnp.float32(1.0 / (1 << lvl))
        base = bases_ref[lvl:lvl + 1, :]
        i0 = jnp.floor(base)
        frac = base - i0
        i0s.append(i0.astype(jnp.int32))
        cs = []
        for m in range(taps + 1):
            c = jnp.zeros_like(frac)
            if m < taps:
                c = c + (1.0 - frac) * g_t[lvl * taps + m:lvl * taps + m + 1, :]
            if m >= 1:
                c = c + frac * g_t[lvl * taps + m - 1:lvl * taps + m, :]
            cs.append(c * inv)
        coeffs.append(cs)

    def body(i, _):
        d0 = i * 8
        shape = (8, dvol_ref.shape[1])
        dvec = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + d0
        acc = jnp.zeros(shape, jnp.float32)
        for lvl in range(levels):
            valid_len = (length >> lvl) << lvl
            t = jnp.where(dvec < valid_len, (dvec >> lvl) - i0s[lvl], -1)
            for m in range(taps + 1):
                acc = acc + jnp.where(t == m, coeffs[lvl][m], 0.0)
        dvol_ref[pl.ds(d0, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)


def _pyr_t_fwd_impl(vol_t, bases_t, taps: int, interpret: bool,
                    pixel_major: bool):
    length, r = vol_t.shape
    levels = bases_t.shape[0]
    dpad = _round_up(max(length, 8), 8)
    tile = _pix_tile(dpad)
    rpad = _round_up(max(r, 128), tile)
    vol_p = jnp.pad(
        vol_t.astype(jnp.float32), ((0, dpad - length), (0, rpad - r))
    )
    bases_p = jnp.pad(bases_t.astype(jnp.float32), ((0, 0), (0, rpad - r)))
    if pixel_major:
        out_spec = pl.BlockSpec((tile, levels * taps), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((rpad, levels * taps), jnp.float32)
    else:
        out_spec = pl.BlockSpec((levels * taps, tile), lambda i: (0, i))
        out_shape = jax.ShapeDtypeStruct((levels * taps, rpad), jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _pyr_t_fwd_kernel, length=length, taps=taps, levels=levels,
            pixel_major=pixel_major,
        ),
        grid=(rpad // tile,),
        in_specs=[
            pl.BlockSpec((dpad, tile), lambda i: (0, i)),
            pl.BlockSpec((levels, tile), lambda i: (0, i)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(vol_p, bases_p)
    return out[:r] if pixel_major else out[:, :r]


def _pyr_t_bwd_impl(bases_t, g, length: int, interpret: bool,
                    pixel_major: bool):
    levels, r = bases_t.shape
    taps = (g.shape[1] if pixel_major else g.shape[0]) // levels
    dpad = _round_up(max(length, 8), 8)
    tile = _pix_tile(dpad)
    rpad = _round_up(max(r, 128), tile)
    bases_p = jnp.pad(bases_t.astype(jnp.float32), ((0, 0), (0, rpad - r)))
    if pixel_major:
        g_p = jnp.pad(g.astype(jnp.float32), ((0, rpad - r), (0, 0)))
        g_spec = pl.BlockSpec((tile, levels * taps), lambda i: (i, 0))
    else:
        g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, rpad - r)))
        g_spec = pl.BlockSpec((levels * taps, tile), lambda i: (0, i))
    dvol = pl.pallas_call(
        functools.partial(
            _pyr_t_bwd_kernel, length=length, taps=taps, levels=levels,
            pixel_major=pixel_major,
        ),
        grid=(rpad // tile,),
        in_specs=[
            pl.BlockSpec((levels, tile), lambda i: (0, i)),
            g_spec,
        ],
        out_specs=pl.BlockSpec((dpad, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((dpad, rpad), jnp.float32),
        interpret=interpret,
    )(bases_p, g_p)
    return dvol[:length, :r]


def _pyr_t_pallas_fwd(vol_t, bases_t, taps: int, interpret: bool):
    return _pyr_t_fwd_impl(vol_t, bases_t, taps, interpret, False)


def _pyr_t_pallas_bwd(bases_t, g, length: int, interpret: bool):
    return _pyr_t_bwd_impl(bases_t, g, length, interpret, False)


# -- GSPMD partitioning: columns (pixels) are independent, so the kernel
# partitions exactly over the R axis.  Without this rule XLA all-gathers
# both operands and replicates the kernel on every device (measured: 10
# all-gathers on an 8-way mesh), defeating spatial sharding.  The rows
# axis (disparity / levels / taps) must stay replicated.


def _r_dim_spec(*shardings):
    """The PartitionSpec entry for the last (R) dim of the first operand
    that has one; None if all are unsharded there."""
    from jax.sharding import NamedSharding

    for s in shardings:
        if isinstance(s, NamedSharding) and len(s.spec) >= 2 and s.spec[1] is not None:
            return s.spec[1]
    return None


def _cols_partition(n_static, local_fn):
    """partition= callback for a 2-operand, 1-result op where every array
    is [rows, R] and only R may be sharded."""

    def partition(*args):
        static, (mesh, arg_infos, result_infos) = args[:n_static], args[n_static:]
        from jax.sharding import NamedSharding, PartitionSpec as P

        r = _r_dim_spec(*(a.sharding for a in arg_infos))
        arg_sh = tuple(NamedSharding(mesh, P(None, r)) for _ in arg_infos)
        res = result_infos if not isinstance(result_infos, (list, tuple)) else result_infos[0]
        out_sh = NamedSharding(mesh, P(None, r))

        def lower_fn(*operands):
            return local_fn(*operands, *static)

        return mesh, lower_fn, out_sh, arg_sh

    def infer(*args):
        mesh, arg_infos, result_infos = args[n_static:]
        from jax.sharding import NamedSharding, PartitionSpec as P

        r = _r_dim_spec(*(a.sharding for a in arg_infos))
        return NamedSharding(mesh, P(None, r))

    return partition, infer


_pyr_t_fwd_sharded = custom_partitioning = None
if _HAS_PALLAS:
    from jax.experimental.custom_partitioning import custom_partitioning

    _pyr_t_fwd_sharded = custom_partitioning(
        _pyr_t_pallas_fwd, static_argnums=(2, 3)
    )
    _p, _i = _cols_partition(2, _pyr_t_pallas_fwd)
    _pyr_t_fwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="l r, v r -> t r",
        need_replication_factors=("l", "v", "t"),
    )

    _pyr_t_bwd_sharded = custom_partitioning(
        _pyr_t_pallas_bwd, static_argnums=(2, 3)
    )
    _p, _i = _cols_partition(2, _pyr_t_pallas_bwd)
    _pyr_t_bwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="v r, g r -> l r",
        need_replication_factors=("v", "g", "l"),
    )
else:  # pragma: no cover
    _pyr_t_bwd_sharded = None




# ----------------------------------------------------------------- #
# pixel-major output variant: same transposed compute (pixels on
# lanes), but the [levels*taps, tile] result is transposed IN-KERNEL
# (one VMEM sublane/lane shuffle per tile, measured ~0.2 ms per
# 240k-pixel volume) so the kernel emits [R, levels*taps] directly.
# The XLA-side alternative — transpose + per-level slice + interleave
# + concat of the row-major output — measured 1.2 ms per GRU
# iteration at KITTI size (38 MB of strided 18-minor-dim shuffles);
# with pixel-major outputs every downstream reshape is free.
# Implementation shared with the row-major kernels above
# (pixel_major=True in _pyr_t_fwd_kernel/_pyr_t_bwd_kernel).
# ----------------------------------------------------------------- #


def _pyr_t_pm_pallas_fwd(vol_t, bases_t, taps: int, interpret: bool):
    return _pyr_t_fwd_impl(vol_t, bases_t, taps, interpret, True)


def _pyr_t_pm_pallas_bwd(bases_t, g, length: int, interpret: bool):
    return _pyr_t_bwd_impl(bases_t, g, length, interpret, True)


# Partitioning for the pixel-major variants: the pixel axis R is dim 1 of
# vol_t/bases_t but dim 0 of the [R, C] output (and of the bwd's incoming
# gradient); rows/channels stay replicated.
def _pm_partition(local_fn, r_dims_in, r_dim_out, n_static: int = 2):
    """r_dims_in: per-operand axis index carrying R; r_dim_out: same for
    the result; n_static: number of trailing static args."""

    def _spec(ndim, r_axis, r):
        from jax.sharding import PartitionSpec as P

        return P(*[r if i == r_axis else None for i in range(ndim)])

    def _find_r(arg_infos):
        from jax.sharding import NamedSharding

        for a, r_axis in zip(arg_infos, r_dims_in):
            s = a.sharding
            if (
                isinstance(s, NamedSharding)
                and len(s.spec) > r_axis
                and s.spec[r_axis] is not None
            ):
                return s.spec[r_axis]
        return None

    def partition(*args):
        static, (mesh, arg_infos, result_infos) = args[:n_static], args[n_static:]
        from jax.sharding import NamedSharding

        r = _find_r(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, _spec(len(a.shape), r_axis, r))
            for a, r_axis in zip(arg_infos, r_dims_in)
        )
        res = (
            result_infos
            if not isinstance(result_infos, (list, tuple))
            else result_infos[0]
        )
        out_sh = NamedSharding(mesh, _spec(len(res.shape), r_dim_out, r))

        def lower_fn(*operands):
            return local_fn(*operands, *static)

        return mesh, lower_fn, out_sh, arg_sh

    def infer(*args):
        mesh, arg_infos, result_infos = args[n_static:]
        from jax.sharding import NamedSharding

        res = (
            result_infos
            if not isinstance(result_infos, (list, tuple))
            else result_infos[0]
        )
        r = _find_r(arg_infos)
        return NamedSharding(mesh, _spec(len(res.shape), r_dim_out, r))

    return partition, infer


if _HAS_PALLAS:
    _pyr_t_pm_fwd_sharded = custom_partitioning(
        _pyr_t_pm_pallas_fwd, static_argnums=(2, 3)
    )
    _p, _i = _pm_partition(_pyr_t_pm_pallas_fwd, (1, 1), 0)
    _pyr_t_pm_fwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="l r, v r -> r t",
        need_replication_factors=("l", "v", "t"),
    )

    _pyr_t_pm_bwd_sharded = custom_partitioning(
        _pyr_t_pm_pallas_bwd, static_argnums=(2, 3)
    )
    _p, _i = _pm_partition(_pyr_t_pm_pallas_bwd, (1, 0), 1)
    _pyr_t_pm_bwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="v r, r g -> l r",
        need_replication_factors=("v", "g", "l"),
    )
else:  # pragma: no cover
    _pyr_t_pm_fwd_sharded = _pyr_t_pm_bwd_sharded = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_pyramid_window_pm(
    vol_t: jnp.ndarray, bases_t: jnp.ndarray, taps: int, interpret: bool = False
):
    """Pixel-major-output twin of gather_pyramid_window_t.

    vol_t: [L, R] (disparity-major), bases_t: [levels, R] →
    out [R, levels*taps] fp32 with level-major tap blocks per pixel.  The
    result transpose happens in-kernel (VMEM), so downstream reshapes to
    [B, H, W, ...] are free.  Level i reads the avg-pool-by-2^i of each
    column (floor-truncation semantics, geometry.py:24-28); positions are
    non-differentiable (detached-disparity lookup).  Partitions over R
    under GSPMD."""
    return _pyr_t_pm_fwd_sharded(vol_t, bases_t, taps, interpret)


def _gpwpm_fwd(vol_t, bases_t, taps, interpret):
    return _pyr_t_pm_fwd_sharded(vol_t, bases_t, taps, interpret), (
        bases_t,
        vol_t.shape[0],
    )


def _gpwpm_bwd(taps, interpret, res, g):
    bases_t, length = res
    return _pyr_t_pm_bwd_sharded(bases_t, g, length, interpret), None


gather_pyramid_window_pm.defvjp(_gpwpm_fwd, _gpwpm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_pyramid_window_t(
    vol_t: jnp.ndarray, bases_t: jnp.ndarray, taps: int, interpret: bool = False
):
    """Transposed-layout twin of gather_pyramid_window.

    vol_t: [L, R] (disparity-major), bases_t: [levels, R] →
    out [levels*taps, R] fp32 with level-major tap blocks.  Level i reads
    the avg-pool-by-2^i of each column (floor-truncation semantics,
    geometry.py:24-28), computed in-kernel; positions are
    non-differentiable (detached-disparity lookup).  Partitions over R
    (each pixel-column is independent) under GSPMD."""
    return _pyr_t_fwd_sharded(vol_t, bases_t, taps, interpret)


def _gpwt_fwd(vol_t, bases_t, taps, interpret):
    return _pyr_t_fwd_sharded(vol_t, bases_t, taps, interpret), (
        bases_t,
        vol_t.shape[0],
    )


def _gpwt_bwd(taps, interpret, res, g):
    bases_t, length = res
    return _pyr_t_bwd_sharded(bases_t, g, length, interpret), None


gather_pyramid_window_t.defvjp(_gpwt_fwd, _gpwt_bwd)


# ----------------------------------------------------------------- #
# barrel-shift-aligned lookup: instead of classifying every (d, pixel)
# element into its tap slot (taps+1 compare/select/adds per element per
# level ≈ 60 VPU ops/element — the measured 1.25 ms/GRU-iter), roll each
# pixel's column DOWN by its own window start i0 so the taps land on
# STATIC sublane rows.  A per-lane dynamic roll is log2(Lpad) barrel
# steps (static-shift pltpu.roll + per-lane select), after which every
# pyramid level's taps are static row slices: level-lvl pooled tap j
# reads rows off+c+2^lvl*j+m, where c = 2^lvl*i0_lvl - i0_0 + M - off
# (a per-lane value in [0, 2^lvl)) selects the pooling parity.  Row
# indices are taken mod Lpad (circular roll), so no pad margins are
# needed: valid taps always land inside [0, L) and invalid taps are
# zeroed by explicit masks (0 <= i0_lvl + j < L >> lvl), reproducing
# grid_sample zero padding.  ~14 (GEV) / ~20 (corr) VPU ops per volume
# element vs ~60 for the classify kernels — same math, same interface
# family as gather_pyramid_window_pm but taking the level-0 position x
# (base_lvl = x * 2^-lvl - radius, exactly how pyramid_lookup builds
# its bases) instead of per-level bases, which is what lets one roll
# serve every level.
# ----------------------------------------------------------------- #


def _aligned_geometry(taps: int, levels: int, radius: int):
    """Margin M, per-level base row offsets, and the aligned-window size.

    o_lvl = 2^lvl*i0_lvl - i0_0 + M ranges over [off_lvl, off_lvl + 2^lvl)
    with off_lvl = M - (radius+1)*(2^lvl - 1); M makes off_lvl >= 0."""
    M = (radius + 1) * (2 ** (levels - 1) - 1)
    offs = [M - (radius + 1) * (2**lvl - 1) for lvl in range(levels)]
    window = 1 + max(
        offs[lvl] + (2**lvl - 1) + (2**lvl) * taps + (2**lvl - 1)
        for lvl in range(levels)
    )
    return M, offs, window


def _clamp_bounds(length: int, taps: int, levels: int, radius: int):
    """x-clamp range: values at/beyond the bounds produce all-zero taps at
    every level, so clamping only moves dead lanes (keeps floor/int32 and
    the barrel bit-width finite for arbitrary disparities)."""
    slack = (radius + 2) * (2**levels)
    return float(-slack), float(length + slack)


def _pyr_align_fwd_kernel(vol_ref, x_ref, out_ref, *, length: int, taps: int,
                          levels: int, radius: int, variant: str = "full",
                          pixel_major: bool = True):
    """variant != "full" ablates stages for tools/kbench_lookup.py timing
    attribution ONLY (wrong values): "copy" skips rolls+extraction, "rolls"
    skips extraction, "extract" skips rolls.  All branches are
    Python-static (no runtime cost).

    pixel_major selects the OUTPUT layout explicitly ([tile, levels*taps]
    when True, [levels*taps, tile] when False) — the caller's out_specs
    must match; layout is never inferred from the block shape."""
    lpad = vol_ref.shape[0]
    M, offs, window = _aligned_geometry(taps, levels, radius)
    lo, hi = _clamp_bounds(length, taps, levels, radius)
    xc = jnp.clip(x_ref[0:1, :], lo, hi)  # [1, P]
    i0f0 = jnp.floor(xc - radius)
    i0_0 = i0f0.astype(jnp.int32)
    roll = jax.lax.rem(i0_0 - M, lpad)
    roll = jnp.where(roll < 0, roll + lpad, roll)  # [1, P] in [0, lpad)

    # Two-stage barrel roll: apply the COARSE bits (shift >= 2^fine_bits)
    # on the full [lpad, P] block, then slice down to the rows the fine
    # bits can still reach (window + 2^fine_bits - 1) and finish there —
    # for a deep volume (all-pairs corr, lpad ~ W) the fine steps then
    # move ~window rows instead of lpad rows (~2x fewer roll VPU ops).
    # Safety of the non-modular fine phase: target rows j < window read
    # source rows j + lo <= window + 2^fine_bits - 2 < fine_rows, and the
    # circular wrap of pltpu.roll on the slice only pollutes rows
    # >= fine_rows - shift, all of which are beyond the window.
    total_bits = (lpad - 1).bit_length()
    fine_bits = min(5, total_bits)
    fine_rows = min(lpad, _round_up(window + (1 << fine_bits) - 1, 8))

    aligned = vol_ref[:]  # [lpad, P]
    if variant not in ("copy", "extract"):
        for b in range(fine_bits, total_bits):
            # net shift = -(sum of set bits) mod lpad → aligned[j] = vol[(j + roll) % lpad]
            bit = ((roll >> b) & 1) == 1
            shifted = pltpu.roll(aligned, shift=(lpad - (1 << b)) % lpad, axis=0)
            aligned = jnp.where(bit, shifted, aligned)
        aligned = aligned[0:fine_rows, :]
        for b in range(min(fine_bits, total_bits)):
            bit = ((roll >> b) & 1) == 1
            shifted = pltpu.roll(
                aligned, shift=(fine_rows - (1 << b)) % fine_rows, axis=0
            )
            aligned = jnp.where(bit, shifted, aligned)
    if variant in ("copy", "rolls"):
        res = aligned[0:levels * taps, :] + (xc - xc)  # keep x live
        if pixel_major:
            out_ref[:, :] = jnp.swapaxes(res, 0, 1).astype(out_ref.dtype)
        else:
            out_ref[:, :] = res.astype(out_ref.dtype)
        return

    # Tap extraction on [taps+1, P] blocks (full sublane utilization)
    # instead of taps+1 single-row selects: level-lvl pooled tap j for
    # parity c is the width-wide row sum starting at off+c+width*j, i.e.
    # a reshape-sum over a contiguous [width*(taps+1), P] slice.
    rows = []
    for lvl in range(levels):
        width = 1 << lvl
        base = xc * (2.0**-lvl) - radius
        i0f = jnp.floor(base)
        frac = base - i0f
        i0 = i0f.astype(jnp.int32)
        l_lvl = length >> lvl
        inv = jnp.float32(1.0 / width)
        off = offs[lvl]
        if lvl == 0:
            sv = aligned[off:off + taps + 1, :]  # [taps+1, P]
        else:
            cand = i0 * width - i0_0 + (M - off)  # per-lane in [0, width)
            sv = None
            for c in range(width):
                blk = aligned[off + c:off + c + width * (taps + 1), :]
                svc = blk.reshape(taps + 1, width, blk.shape[-1]).sum(axis=1)
                sel = jnp.where(cand == c, svc, 0.0)
                sv = sel if sv is None else sv + sel
            sv = sv * inv
        j_idx = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 0)
        valid = (i0 + j_idx >= 0) & (i0 + j_idx <= l_lvl - 1)
        sv = jnp.where(valid, sv, 0.0)
        rows.append((1.0 - frac) * sv[:taps, :] + frac * sv[1:, :])
    # interpolation stays fp32 throughout; only the final store rounds to
    # the requested output dtype (same rounding as the XLA-side cast the
    # bf16-out mode replaces)
    res = jnp.concatenate(rows, axis=0)  # [levels*taps, P]
    if pixel_major:
        out_ref[:, :] = jnp.swapaxes(res, 0, 1).astype(out_ref.dtype)
    else:
        out_ref[:, :] = res.astype(out_ref.dtype)


def _pyr_align_bwd_kernel(x_ref, g_ref, dvol_ref, *, length: int, taps: int,
                          levels: int, radius: int):
    lpad = dvol_ref.shape[0]
    tile = dvol_ref.shape[1]
    M, offs, window = _aligned_geometry(taps, levels, radius)
    lo, hi = _clamp_bounds(length, taps, levels, radius)
    xc = jnp.clip(x_ref[0:1, :], lo, hi)
    i0_0 = jnp.floor(xc - radius).astype(jnp.int32)
    roll = jax.lax.rem(i0_0 - M, lpad)
    roll = jnp.where(roll < 0, roll + lpad, roll)

    g_t = jnp.swapaxes(g_ref[:, :], 0, 1)  # [levels*taps, P]
    win = [jnp.zeros((1, tile), jnp.float32) for _ in range(window)]
    for lvl in range(levels):
        width = 1 << lvl
        base = xc * (2.0**-lvl) - radius
        i0f = jnp.floor(base)
        frac = base - i0f
        i0 = i0f.astype(jnp.int32)
        l_lvl = length >> lvl
        inv = jnp.float32(1.0 / width)
        off = offs[lvl]
        cand = None if lvl == 0 else i0 * width - i0_0 + (M - off)
        for j in range(taps + 1):
            coeff = jnp.zeros((1, tile), jnp.float32)
            if j < taps:
                coeff = coeff + (1.0 - frac) * g_t[lvl * taps + j:lvl * taps + j + 1, :]
            if j >= 1:
                coeff = coeff + frac * g_t[lvl * taps + j - 1:lvl * taps + j, :]
            valid = (i0 + j >= 0) & (i0 + j <= l_lvl - 1)
            coeff = jnp.where(valid, coeff * inv, 0.0)
            if lvl == 0:
                win[off + j] = win[off + j] + coeff
            else:
                for c in range(width):
                    sel = jnp.where(cand == c, coeff, 0.0)
                    for m in range(width):
                        r0 = off + c + width * j + m
                        win[r0] = win[r0] + sel
    a = jnp.concatenate(
        win + [jnp.zeros((lpad - window, tile), jnp.float32)], axis=0
    )  # [lpad, P]
    # transpose of aligned[j] = vol[(j + roll) % lpad]: dvol[p] = A[(p - roll) % lpad]
    for b in range((lpad - 1).bit_length()):
        bit = ((roll >> b) & 1) == 1
        shifted = pltpu.roll(a, shift=(1 << b) % lpad, axis=0)
        a = jnp.where(bit, shifted, a)
    dvol_ref[:, :] = a


def _align_lpad(length: int, taps: int, levels: int, radius: int) -> int:
    _, _, window = _aligned_geometry(taps, levels, radius)
    return _round_up(max(length, window, 8), 8)


def _pyr_a_pm_pallas_fwd(vol_t, x, taps: int, levels: int, interpret: bool,
                         out_dtype_name: str = "float32"):
    length, r = vol_t.shape
    radius = (taps - 1) // 2
    lpad = _align_lpad(length, taps, levels, radius)
    tile = _pix_tile(lpad)
    rpad = _round_up(max(r, 128), tile)
    vol_p = jnp.pad(
        vol_t.astype(jnp.float32), ((0, lpad - length), (0, rpad - r))
    )
    x_p = jnp.pad(x.astype(jnp.float32).reshape(1, -1), ((0, 0), (0, rpad - r)))
    out = pl.pallas_call(
        functools.partial(
            _pyr_align_fwd_kernel, length=length, taps=taps, levels=levels,
            radius=radius,
        ),
        grid=(rpad // tile,),
        in_specs=[
            pl.BlockSpec((lpad, tile), lambda i: (0, i)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((tile, levels * taps), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (rpad, levels * taps), jnp.dtype(out_dtype_name)
        ),
        interpret=interpret,
    )(vol_p, x_p)
    return out[:r]


def _pyr_a_pm_pallas_bwd(x, g, length: int, taps: int, levels: int,
                         interpret: bool):
    r = x.shape[0]
    radius = (taps - 1) // 2
    lpad = _align_lpad(length, taps, levels, radius)
    tile = _pix_tile(lpad)
    rpad = _round_up(max(r, 128), tile)
    x_p = jnp.pad(x.astype(jnp.float32).reshape(1, -1), ((0, 0), (0, rpad - r)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, rpad - r), (0, 0)))
    dvol = pl.pallas_call(
        functools.partial(
            _pyr_align_bwd_kernel, length=length, taps=taps, levels=levels,
            radius=radius,
        ),
        grid=(rpad // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((tile, levels * taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((lpad, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((lpad, rpad), jnp.float32),
        interpret=interpret,
    )(x_p, g_p)
    return dvol[:length, :r]


if _HAS_PALLAS:
    _pyr_a_pm_fwd_sharded = custom_partitioning(
        _pyr_a_pm_pallas_fwd, static_argnums=(2, 3, 4, 5)
    )
    _p, _i = _pm_partition(_pyr_a_pm_pallas_fwd, (1, 0), 0, n_static=4)
    _pyr_a_pm_fwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="l r, r -> r t",
        need_replication_factors=("l", "t"),
    )

    _pyr_a_pm_bwd_sharded = custom_partitioning(
        _pyr_a_pm_pallas_bwd, static_argnums=(2, 3, 4, 5)
    )
    _p, _i = _pm_partition(_pyr_a_pm_pallas_bwd, (0, 0), 1, n_static=4)
    _pyr_a_pm_bwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="r, r g -> l r",
        need_replication_factors=("g", "l"),
    )
else:  # pragma: no cover
    _pyr_a_pm_fwd_sharded = _pyr_a_pm_bwd_sharded = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def gather_pyramid_aligned_pm(
    vol_t: jnp.ndarray, x: jnp.ndarray, taps: int, levels: int,
    interpret: bool = False, out_dtype_name: str = "float32",
):
    """Barrel-shift-aligned pyramid lookup, pixel-major output.

    vol_t: [L, R] (disparity-major, pixels on lanes); x: [R] level-0
    positions — level lvl samples taps at base_lvl + k, base_lvl =
    x * 2^-lvl - radius, radius = (taps-1)//2 (exactly pyramid_lookup's
    tap geometry, geometry.py:41-53).  Returns [R, levels*taps] fp32,
    level-major tap blocks per pixel; out-of-range taps are zero.  Level
    lvl reads the avg-pool-by-2^lvl of each column (floor truncation,
    geometry.py:24-28) derived in-kernel from one per-lane barrel roll.
    Positions are non-differentiable.  Partitions over R under GSPMD."""
    return _pyr_a_pm_fwd_sharded(vol_t, x, taps, levels, interpret,
                                 out_dtype_name)


def _gpa_fwd(vol_t, x, taps, levels, interpret, out_dtype_name):
    return _pyr_a_pm_fwd_sharded(
        vol_t, x, taps, levels, interpret, out_dtype_name
    ), (x, vol_t.shape[0])


def _gpa_bwd(taps, levels, interpret, out_dtype_name, res, g):
    x, length = res
    # _pyr_a_pm_pallas_bwd upcasts g to fp32 internally; dvol is fp32
    return _pyr_a_pm_bwd_sharded(x, g, length, taps, levels, interpret), None


gather_pyramid_aligned_pm.defvjp(_gpa_fwd, _gpa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_linear(vol: jnp.ndarray, pos: jnp.ndarray, interpret: bool = False):
    """Linear-interpolated row gather: out[r, k] = lerp(vol[r], pos[r, k]),
    zero outside [0, L-1].  vol: [R, L], pos: [R, K] → [R, K] fp32.

    Positions are treated as non-differentiable (the reference detaches the
    disparity before every lookup)."""
    return _pallas_fwd(vol, pos, interpret)


def _grl_fwd(vol, pos, interpret):
    return _pallas_fwd(vol, pos, interpret), (pos, vol.shape[1])


def _grl_bwd(interpret, res, g):
    pos, length = res
    dvol = _pallas_bwd(pos, g, length, interpret)
    return dvol, None


gather_rows_linear.defvjp(_grl_fwd, _grl_bwd)
