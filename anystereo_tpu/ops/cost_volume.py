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
