"""Cost-volume construction and soft-argmin disparity regression.

Layout (TPU-native): feature maps are NHWC; volumes are [B, H, W, G, D] /
[B, H, W, D] with the disparity axis innermost (lane dimension), so lookups
read contiguous rows and reductions over D vectorize on the VPU.

Spec: models/coreContinuous_IGEV/submodule.py:253-325 and
Combined_Geo_Encoding_Volume.corr (geometry.py:63-72).  The reference builds
volumes NCDHW with a Python loop over disparity and in-place writes; here the
shift structure is expressed with static padded slices that XLA fuses into a
single loop nest, and the all-pairs correlation is one batched matmul on the
MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def all_pairs_correlation(fl: jnp.ndarray, fr: jnp.ndarray) -> jnp.ndarray:
    """All-pairs 1-D correlation along the scanline.

    fl: [B, H, W1, C], fr: [B, H, W2, C]  →  [B, H, W1, W2]

    corr[b,h,i,j] = <fl[b,h,i,:], fr[b,h,j,:]>  — unnormalized, matching
    torch.einsum('aijk,aijh->ajkh') at geometry.py:70 (no /sqrt(C)).
    Accumulates in fp32 regardless of input dtype (reference runs this in
    fp32, continuous_IGEVstereo.py:276).
    """
    return jnp.einsum(
        "bhwc,bhvc->bhwv",
        fl,
        fr,
        preferred_element_type=jnp.float32,
        # HIGHEST keeps fp32 inputs exact (parity with the reference's fp32
        # einsum); bf16 inputs still take the native MXU path.
        precision=jax.lax.Precision.HIGHEST,
    )


def _shift_right(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """x shifted by +d along `axis` with zero fill (x'[..., w, ...] =
    x[..., w-d, ...], zero for w < d)."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (d, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def build_gwc_volume(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int, num_groups: int
) -> jnp.ndarray:
    """Group-wise correlation volume.

    fl, fr: [B, H, W, C] → [B, H, W, G, D] with
    vol[b,h,w,g,d] = mean_c fl[b,h,w,gc] * fr[b,h,w-d,gc], zero where w < d
    (the reference's zero-initialized triangle, submodule.py:263-269).

    Implemented as a lax.scan over the disparity axis, shifting the right
    features one column per step — the program size is O(1) in D (a
    D-unrolled loop of padded slices made XLA compiles of the 48-deep
    volume pathologically slow).
    """
    b, h, w, c = fl.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cg = c // num_groups
    fl_g = fl.reshape(b, h, w, num_groups, cg).astype(jnp.float32)
    fr_g = fr.reshape(b, h, w, num_groups, cg).astype(jnp.float32)

    def step(fr_cur, _):
        slab = (fl_g * fr_cur).mean(axis=-1)  # [B, H, W, G]
        fr_next = _shift_right(fr_cur, 1, axis=2)
        return fr_next, slab

    _, slabs = jax.lax.scan(step, fr_g, None, length=max_disp)  # [D, B, H, W, G]
    return jnp.moveaxis(slabs, 0, -1)  # [B, H, W, G, D]


def _band_from_all_pairs(ap: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Banded extraction from an all-pairs matrix, gather-free.

    ap: [..., W, W] with rows w (left column) and cols v (right column) →
    band [..., W, D]: band[..., w, d] = ap[..., w, w-d], zero where w < d
    (the reference's zero-initialized triangle, submodule.py:263-269).

    TPU note: take_along_axis would lower to per-element scalar gathers;
    instead the diagonal stride is materialized by flattening the last two
    axes and re-viewing at pitch W+1 — flat[w*(W+1)+j] == ap[w, w+j-D+1]
    — so the whole thing is pad + reshape + slice, which XLA turns into a
    single strided copy."""
    *lead, w_rows, w_cols = ap.shape
    assert w_rows == w_cols, "all-pairs matrix must be square"
    d = max_disp
    assert d <= w_rows, "banded extraction needs max_disp <= W"
    flat = ap.reshape(*lead, w_rows * w_rows)
    flat = jnp.pad(
        flat, [(0, 0)] * len(lead) + [(d - 1, w_rows - d + 1)]
    )
    q = flat.reshape(*lead, w_rows, w_rows + 1)[..., :d]
    band = q[..., ::-1]  # j = D-1-d → d ascending
    mask = jnp.arange(w_rows)[:, None] >= jnp.arange(d)[None, :]
    return jnp.where(mask, band, 0.0)


def build_gwc_and_corr(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int, num_groups: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused GWC volume + all-pairs correlation from one set of grouped
    MXU matmuls.

    The IGEV cost stage computes BOTH an all-pairs correlation (the lookup
    pyramid's init-corr, geometry.py:63-72) and a group-wise correlation
    volume (submodule.py:253-269) from the same matching features.  The
    group-wise all-pairs matrices S_g = fl_g @ fr_g^T contain both answers:
      corr = Σ_g S_g          (full-channel inner product)
      gwc[..., g, d] = S_g[w, w-d] / (C/G)   (banded diagonal extraction)
    One einsum per group on the MXU replaces the D-step shift-multiply
    scan (which streams both feature maps through HBM once per disparity —
    the scan's O(D·|f|) traffic, not its FLOPs, made it the cost-stage
    hotspot).

    Returns (gwc [B,H,W,G,D] fp32, corr [B,H,W,W] fp32).  bf16 inputs take
    the native MXU path with exact fp32 accumulation; values match the
    scan build up to fp32 reduction order.  Falls back to the scan build
    when max_disp > W (banded reshape precondition; only toy shapes)."""
    b, h, w, c = fl.shape
    assert c % num_groups == 0
    cg = c // num_groups
    if max_disp > w:
        return (
            build_gwc_volume(fl, fr, max_disp, num_groups),
            all_pairs_correlation(fl, fr),
        )
    fl_g = fl.reshape(b, h, w, num_groups, cg)
    fr_g = fr.reshape(b, h, w, num_groups, cg)
    inv = jnp.float32(1.0 / cg)
    # fp32 inputs must NOT take the default TPU path (operands truncated
    # to bf16 passes) — the reference-regime eval and tiled_infer's
    # exactness check run fp32 compute; match all_pairs_correlation's
    # HIGHEST there.  bf16 inputs keep the native MXU path (products of
    # bf16 values are exact in the fp32 accumulator either way).
    prec = (
        jax.lax.Precision.HIGHEST
        if fl.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    fl_s = jnp.moveaxis(fl_g, 3, 0)  # [G, B, H, W, cg]
    fr_s = jnp.moveaxis(fr_g, 3, 0)

    def step(acc, fg):  # lax.scan: O(1) program in G, one [B,H,W,W] live
        flg, frg = fg
        ap = jnp.einsum(
            "bhwc,bhvc->bhwv",
            flg,
            frg,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return acc + ap, _band_from_all_pairs(ap, max_disp) * inv

    corr, bands = jax.lax.scan(
        step, jnp.zeros((b, h, w, w), jnp.float32), (fl_s, fr_s)
    )
    gwc = jnp.moveaxis(bands, 0, -2)  # [B, H, W, G, D]
    return gwc, corr


def build_gwc_volume_unrolled(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int, num_groups: int
) -> jnp.ndarray:
    """Unrolled twin of build_gwc_volume (oracle for parity tests)."""
    b, h, w, c = fl.shape
    cg = c // num_groups
    fl_g = fl.reshape(b, h, w, num_groups, cg).astype(jnp.float32)
    fr_g = fr.reshape(b, h, w, num_groups, cg).astype(jnp.float32)
    slices = []
    for d in range(max_disp):
        fr_d = _shift_right(fr_g, d, axis=2)
        slices.append((fl_g * fr_d).mean(axis=-1))  # [B, H, W, G]
    return jnp.stack(slices, axis=-1)  # [B, H, W, G, D]


def build_correlation_volume(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    """Plain dot-product volume [B, H, W, D] (submodule.py:291-304)."""
    slices = []
    fl32 = fl.astype(jnp.float32)
    fr32 = fr.astype(jnp.float32)
    for d in range(max_disp):
        fr_d = _shift_right(fr32, d, axis=2)
        slices.append((fl32 * fr_d).sum(axis=-1))
    return jnp.stack(slices, axis=-1)


def build_norm_correlation_volume(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int, eps: float = 1e-5
) -> jnp.ndarray:
    """Cosine-similarity volume [B, H, W, D] (submodule.py:276-289).
    Note the zero-disparity triangle stays exactly zero because the shifted
    right features are zero there, matching the reference's new_zeros fill."""
    fl_n = fl / (jnp.linalg.norm(fl, axis=-1, keepdims=True) + eps)
    fr_n = fr / (jnp.linalg.norm(fr, axis=-1, keepdims=True) + eps)
    slices = []
    for d in range(max_disp):
        fr_d = _shift_right(fr_n, d, axis=2)
        slices.append((fl_n * fr_d).mean(axis=-1))
    return jnp.stack(slices, axis=-1)


def build_concat_volume(
    fl: jnp.ndarray, fr: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    """Concatenation volume [B, H, W, 2C, D] (submodule.py:308-319): left
    features replicated at every d, right features shifted (zero fill)."""
    b, h, w, c = fl.shape
    slices = []
    for d in range(max_disp):
        fr_d = _shift_right(fr, d, axis=2)
        slices.append(jnp.concatenate([fl, fr_d], axis=-1))
    return jnp.stack(slices, axis=-1)


def disparity_regression(prob: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Soft-argmin expectation Σ_d d·p(d) over the last axis
    (submodule.py:321-325).  prob: [..., D] (already softmaxed) → [...]."""
    assert prob.shape[-1] == max_disp
    d_vals = jnp.arange(max_disp, dtype=prob.dtype)
    return jnp.sum(prob * d_vals, axis=-1)
