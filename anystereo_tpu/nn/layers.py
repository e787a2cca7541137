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
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        wdt = w.astype(dt)
        y = None
        for kd in range(3):
            slab = jax.lax.slice_in_dim(xp, kd, kd + 2 * d_out - 1, 2, axis=1)
            s2 = slab.reshape(b * d_out, h, wd, ci).astype(dt)
            o = jax.lax.conv_general_dilated(
                s2, wdt[kd], (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = o if y is None else y + o
        y = y.reshape(b, d_out, y.shape[1], y.shape[2], self.features)
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
        """The k4 s2 p1 3-D transposed conv with the depth axis decomposed
        into four depth-batched 2-D transposed convs (same thin-channel
        conv3d pathology as _Conv3x3x3Folded; see its docstring).

        With the already-flipped kernel wf (conv form), the input-dilated
        conv gives out[2m] = conv2dT(x[m-1], wf[0]) + conv2dT(x[m], wf[2])
        and out[2m+1] = conv2dT(x[m], wf[1]) + conv2dT(x[m+1], wf[3]);
        even/odd slabs are interleaved by a stack+reshape."""
        b, d, h, wd, ci = x.shape
        x2 = x.reshape(b * d, h, wd, ci).astype(dt)
        if _WIDEN_FOLDS:
            # all four kd-taps read the same depth-batched input → one conv
            # with N = 4*Co, then slice the channel groups
            wcat = jnp.concatenate([wf[kd] for kd in range(4)], axis=-1)
            o = jax.lax.conv_general_dilated(
                x2,
                wcat.astype(dt),
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            o = o.reshape(b, d, o.shape[1], o.shape[2], 4 * self.features)
            f = self.features
            ys = [o[..., i * f : (i + 1) * f] for i in range(4)]
        else:
            ys = []
            for kd in range(4):
                o = jax.lax.conv_general_dilated(
                    x2,
                    wf[kd].astype(dt),
                    window_strides=(1, 1),
                    padding=((2, 2), (2, 2)),
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                ys.append(
                    o.reshape(b, d, o.shape[1], o.shape[2], self.features)
                )
        z = jnp.zeros_like(ys[0][:, :1])
        even = jnp.concatenate([z, ys[0][:, :-1]], axis=1) + ys[2]
        odd = ys[1] + jnp.concatenate([ys[3][:, 1:], z], axis=1)
        return jnp.stack([even, odd], axis=2).reshape(
            b, 2 * d, even.shape[2], even.shape[3], self.features
        )


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
