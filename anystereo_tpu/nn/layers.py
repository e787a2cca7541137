"""Conv / norm building blocks (flax linen, NHWC / NDHWC).

Spec: BasicConv / BasicConv_IN / Conv2x_IN / LayerNorm2d
(models/coreContinuous_IGEV/submodule.py:6-188).  All convs use explicit
torch-style padding tuples (not XLA 'SAME') so strided output positions match
the reference exactly; norms follow torch defaults (InstanceNorm: no affine,
eps 1e-5; BatchNorm eps 1e-5 — run frozen, see config.NormType).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from anystereo_tpu.config import NormType

Dtype = Any


def _tup(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm without affine (torch default): normalize each channel
    over all spatial dims of each sample.  Works for NHWC and NDHWC."""
    axes = tuple(range(1, x.ndim - 1))
    mu = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class FrozenBatchNorm(nn.Module):
    """BatchNorm running in permanently-frozen (eval) mode.

    The reference trains with every BatchNorm2d switched to eval
    (train_continuous_IGEV.py:203, continuous_IGEVstereo.py:178-190), so the
    layer is a fixed affine transform by (mean, var) statistics that are
    never updated.  scale/bias are trainable; mean/var live in 'batch_stats'
    (importable from converted torch checkpoints)."""

    features: int
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(dt)
        return x * inv + (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(dt)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm per pixel (submodule.py:149-188): normalize
    over C only, with per-channel affine; eps 1e-6, variance computed biased
    and added *before* sqrt (matching the custom autograd fn)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def make_norm(kind: NormType, features: int, dtype=None) -> Callable:
    """Returns a callable norm for the given config kind."""
    if kind is NormType.INSTANCE:
        return instance_norm
    if kind is NormType.FROZEN_BATCH:
        return FrozenBatchNorm(features, dtype=dtype)
    if kind is NormType.LAYER:
        return LayerNorm2d(features)
    if kind is NormType.GROUP:
        return nn.GroupNorm(num_groups=max(features // 8, 1), epsilon=1e-5, dtype=dtype)
    if kind is NormType.NONE:
        return lambda x: x
    raise ValueError(kind)


# A/B toggle for the kd-tap lane-widening inside the folded 3-D convs
# (tools/profile_stages.py measured the 3-conv form vs the single widened
# conv; see docs/PERF.md round-5 notes).  Module-level because the folded
# convs are built deep inside ConvNormAct without config access.
_WIDEN_FOLDS = False


def set_widen_folds(on: bool) -> None:
    global _WIDEN_FOLDS
    _WIDEN_FOLDS = bool(on)


_ACTS = {
    "leaky": lambda x: nn.leaky_relu(x, negative_slope=0.01),  # torch default slope
    "relu": nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    # exact (erf) form — torch nn.GELU() default (submodule.py:252)
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
    None: lambda x: x,
}


class _Conv3x3x3Folded(nn.Module):
    """Exact 3x3x3 stride-1 conv3d as three 2-D convs with the depth axis
    folded into batch: out[d] = sum_kd conv2d(x[d+kd-1], w[kd]).

    XLA's conv3d lowering runs the hourglass's thin-channel volumes ~3.5x
    slower than this formulation on TPU v5e (measured 1.91 ms vs 0.55 ms
    for the corr_stem's 8->8 conv at [48,96,312]); the 2-D convs hit the
    well-tuned conv2d path with depth multiplying the batch dim.  Param
    tree (kernel [3,3,3,Ci,Co] + bias) and initialization are identical
    to nn.Conv, so checkpoints and torch conversion are unaffected."""

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, ci, self.features),
            self.param_dtype,
        )
        dt = self.dtype or x.dtype
        b, d, h, wd, _ = x.shape
        x2 = x.reshape(b * d, h, wd, ci).astype(dt)
        if _WIDEN_FOLDS:
            # all three kd-taps read the SAME depth-batched input → ONE
            # conv with the kd kernels concatenated on the output-channel
            # axis (N = 3*Co), then a depth-shifted add of channel groups
            wcat = jnp.concatenate([w[0], w[1], w[2]], axis=-1).astype(dt)
            o = jax.lax.conv_general_dilated(
                x2, wcat, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, d, h, wd, 3 * self.features)
            f = self.features
            outs = [o[..., i * f : (i + 1) * f] for i in range(3)]
        else:
            wdt = w.astype(dt)
            outs = [
                jax.lax.conv_general_dilated(
                    x2, wdt[kd], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).reshape(b, d, h, wd, self.features)
                for kd in range(3)
            ]
        z = jnp.zeros_like(outs[0][:, :1])
        y = (
            jnp.concatenate([z, outs[0][:, :-1]], axis=1)
            + outs[1]
            + jnp.concatenate([outs[2][:, 1:], z], axis=1)
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(dt)
        return y


class _Conv3x3x3FoldedS2(nn.Module):
    """Exact 3x3x3 stride-2 conv3d (pad 1) as three depth-subsampled 2-D
    stride-2 convs: out[od] = sum_kd conv2d_s2(x[2*od + kd - 1], w[kd]).

    Same rationale as _Conv3x3x3Folded: XLA's conv3d lowering handles the
    hourglass's thin-channel volumes poorly on TPU; the depth-batched 2-D
    convs hit the tuned conv2d path.  Param tree (kernel [3,3,3,Ci,Co] +
    bias) and init are identical to nn.Conv — checkpoints and torch
    conversion unaffected."""

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, ci, self.features),
            self.param_dtype,
        )
        dt = self.dtype or x.dtype
        b, d, h, wd, _ = x.shape
        d_out = (d - 1) // 2 + 1
        wdt = w.astype(dt)
        # Round-5 reformulation: the old form strided-sliced three depth
        # slabs of the INPUT and convolved each — measured 3.48 ms at 0.2%
        # MXU for the level-0 down conv (tools/profile_agg.py; the
        # pad+strided-slab pattern lowers to a gather-fed conv).  Instead
        # run the three kd-tap stride-2 2-D convs DENSE over all D depths
        # (contiguous input, the tuned conv2d path — 2x the depth-FLOPs,
        # which are ~100x cheaper than the gather), then depth-subsample
        # the 4x-smaller outputs with cheap static slices.
        x2 = x.reshape(b * d, h, wd, ci).astype(dt)
        ys = []
        for kd in range(3):
            o = jax.lax.conv_general_dilated(
                x2, wdt[kd], (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            ys.append(o.reshape(b, d, o.shape[1], o.shape[2], self.features))
        # out[od] = y0[2od-1] + y1[2od] + y2[2od+1]  (out-of-range = 0)
        y1 = ys[1][:, 0 : 2 * d_out - 1 : 2]
        zslab = jnp.zeros_like(y1[:, :1])  # y1 always has d_out >= 1 slabs
        y2p = ys[2][:, 1 : 2 * d_out : 2]
        if y2p.shape[1] < d_out:  # odd D: 2*(d_out-1)+1 == d is out of range
            y2p = jnp.concatenate([y2p, zslab], axis=1)
        y0p = ys[0][:, 1 : 2 * d_out - 2 : 2]
        y0p = jnp.concatenate([zslab, y0p], axis=1)
        y = y0p + y1 + y2p
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(dt)
        return y


class ConvNormAct(nn.Module):
    """conv (bias=False when normed) → norm → activation.

    Covers BasicConv (BN + LeakyReLU, submodule.py:6-32), BasicConv_IN
    (IN + LeakyReLU, :77-103) and their 3D / transposed variants, for any
    spatial rank (NHWC or NDHWC input).
    """

    features: int
    kernel: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    norm: NormType = NormType.INSTANCE
    act: Optional[str] = "leaky"
    transpose: bool = False
    dims: int = 2
    use_bias: Optional[bool] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _tup(self.kernel, self.dims)
        s = _tup(self.stride, self.dims)
        p = _tup(self.padding, self.dims)
        bias = (self.norm is NormType.NONE) if self.use_bias is None else self.use_bias
        if self.transpose:
            y = TorchConvTranspose(
                self.features, k, s, p, use_bias=bias, dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        elif self.dims == 3 and k == (3, 3, 3) and s == (1, 1, 1) and p == (1, 1, 1):
            # same name/params as the nn.Conv it replaces (see docstring)
            y = _Conv3x3x3Folded(
                self.features, use_bias=bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name="Conv_0",
            )(x)
        elif self.dims == 3 and k == (3, 3, 3) and s == (2, 2, 2) and p == (1, 1, 1):
            y = _Conv3x3x3FoldedS2(
                self.features, use_bias=bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name="Conv_0",
            )(x)
        else:
            y = nn.Conv(
                self.features,
                kernel_size=k,
                strides=s,
                padding=tuple((pi, pi) for pi in p),
                use_bias=bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        norm = make_norm(self.norm, self.features, dtype=self.dtype)
        y = norm(y)
        return _ACTS[self.act](y)


class TorchConvTranspose(nn.Module):
    """ConvTranspose with torch semantics: output = (L-1)*s - 2p + k,
    implemented as an input-dilated convolution with padding k-1-p.
    (The reference uses ConvTranspose2d/3d k4 s2 p1 for all deconvs,
    e.g. submodule.py:42-49, extractor.py:344-346.)"""

    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    padding: Tuple[int, ...]
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims = len(self.kernel)
        in_ch = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, in_ch, self.features),
            self.param_dtype,
        )
        # flip spatial axes → true transposed convolution (gradient of conv),
        # matching torch; keeps converted torch weights drop-in compatible.
        w = jnp.flip(w, axis=tuple(range(dims)))
        dt = self.dtype or x.dtype
        pad = tuple(
            (self.kernel[i] - 1 - self.padding[i], self.kernel[i] - 1 - self.padding[i])
            for i in range(dims)
        )
        if dims == 3 and self.kernel == (4, 4, 4) and self.stride == (2, 2, 2) \
                and self.padding == (1, 1, 1):
            out = self._depth_decomposed_3d(x, w, dt)
        else:
            spatial = "".join("DHW"[-dims + i] for i in range(dims)) if dims <= 3 else None
            lhs_spec = "N" + spatial + "C"
            out = jax.lax.conv_general_dilated(
                x.astype(dt),
                w.astype(dt),
                window_strides=(1,) * dims,
                padding=pad,
                lhs_dilation=self.stride,
                dimension_numbers=(lhs_spec, spatial + "IO", lhs_spec),
            )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            out = out + b.astype(dt)
        return out

    def _depth_decomposed_3d(self, x, wf, dt):
        """The k4 s2 p1 3-D transposed conv as a SUBPIXEL conv (round-5):
        a stride-1 3x3x3 conv producing all 8 phase outputs as channels
        (kernel rebuilt from the flipped wf with structural zeros - per
        axis slot layout [[wf0, 0], [wf2, wf1], [0, wf3]] over
        (kernel-slot, phase)), followed by a 3-D pixel shuffle.

        Why: the lhs-dilated formulation measured 1.6-1.9% MXU at the
        hourglass shapes (tools/profile_agg.py: 0.926 ms for the final
        16->8 deconv); the dense phase conv rides the same depth-batched
        conv2d path as _Conv3x3x3Folded (37% MXU measured) at 27/16 the
        MACs.  Derivation: for output o = 2i+p per axis, the dilated conv
        reads x[i-1+p+dy], dy in {0,1}, with weights wf[2dy+p]; embedding
        both phases in one pad-1 size-3 kernel gives the slot layout."""
        b, d, h, wd, ci = x.shape
        co = self.features

        def expand_axis(w, axis):
            parts = [
                jax.lax.index_in_dim(w, k, axis, keepdims=False)
                for k in range(4)
            ]
            z = jnp.zeros_like(parts[0])
            slots = [
                jnp.stack([parts[0], z], axis=axis),        # [wf0, 0]
                jnp.stack([parts[2], parts[1]], axis=axis),  # [wf2, wf1]
                jnp.stack([z, parts[3]], axis=axis),        # [0, wf3]
            ]
            # -> [..., 3 (slot at axis), 2 (phase at axis+1), ...]
            return jnp.stack(slots, axis=axis)

        # wf [4,4,4,ci,co] -> [3,2, 3,2, 3,2, ci, co] (slot, phase per axis)
        k8 = expand_axis(expand_axis(expand_axis(wf, 2), 1), 0)
        # -> [3,3,3, ci, 2,2,2, co] -> [3,3,3, ci, 8*co]
        k8 = k8.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(3, 3, 3, ci, 8 * co)

        # stride-1 3x3x3 conv via the depth-batched fold (_Conv3x3x3Folded
        # pattern), output channels = 8 phases * co
        x2 = x.reshape(b * d, h, wd, ci).astype(dt)
        k8 = k8.astype(dt)
        outs = [
            jax.lax.conv_general_dilated(
                x2, k8[kd], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, d, h, wd, 8 * co)
            for kd in range(3)
        ]
        z = jnp.zeros_like(outs[0][:, :1])
        y = (
            jnp.concatenate([z, outs[0][:, :-1]], axis=1)
            + outs[1]
            + jnp.concatenate([outs[2][:, 1:], z], axis=1)
        )
        # 3-D pixel shuffle: [b,d,h,w, 2,2,2,co] -> [b, 2d, 2h, 2w, co]
        y = y.reshape(b, d, h, wd, 2, 2, 2, co)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)




class Conv2x(nn.Module):
    """Two-step fusion block (Conv2x_IN, submodule.py:106-145): strided (or
    transposed) conv, concat (or add) with a skip, then a 3x3 conv.  Used by
    the feature pyramid's top-down path (extractor.py:344-346)."""

    features: int
    deconv: bool = False
    concat: bool = True
    keep_concat: bool = True
    norm: NormType = NormType.INSTANCE
    act: Optional[str] = "leaky"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip):
        k = 4 if self.deconv else 3
        y = ConvNormAct(
            self.features, k, stride=2, padding=1, norm=self.norm, act="leaky",
            transpose=self.deconv, dtype=self.dtype,
        )(x)
        if y.shape[1:-1] != skip.shape[1:-1]:
            from anystereo_tpu.ops.sampling import nearest_resize

            y = nearest_resize(y, skip.shape[1:-1])
        if self.concat:
            y = jnp.concatenate([y, skip], axis=-1)
            out_ch = self.features * (2 if self.keep_concat else 1)
        else:
            y = y + skip
            out_ch = self.features
        return ConvNormAct(
            out_ch, 3, stride=1, padding=1, norm=self.norm, act=self.act,
            dtype=self.dtype,
        )(y)


def pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Space-to-depth with torch PixelUnshuffle channel order:
    out[..., c*r*r + dy*r + dx] = in[..., y*r+dy, x*r+dx, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/r, W/r, C, r, r]
    return x.reshape(b, h // r, w // r, c * r * r)
