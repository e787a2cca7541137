"""Feature extraction: the matching-feature pyramid, the RAFT matching
encoder, and the multi-scale context encoder.

Spec: models/coreContinuous_IGEV/extractor.py —
  * FeaturePyramid  ≙ Feature (:327-362): MobileNetV2 trunk split into five
    stages + top-down deconv fusion → [1/4 (48), 1/8 (64), 1/16 (192),
    1/32 (160)] channel pyramid;
  * MultiBasicEncoder (:200-304): 7x7 stem + residual stages producing
    per-GRU-level (hidden, context) heads at 1/4, 1/8, 1/16;
  * BasicEncoder (:126-198): shared-weight instance-norm matching encoder
    (RAFT fnet), output_dim 256 at 1/4.

The MobileNetV2 trunk is implemented from scratch (mobilenetv2_100 layout:
expansion-6 inverted residuals, channels 16/24/32/64/96/160 at strides
2/4/8/16/16/32) so timm-pretrained torch weights can be converted 1:1; norm
is configurable (config.ModelConfig.norm_2d) since from-scratch TPU training
has no pretrained batch statistics to freeze.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from anystereo_tpu.config import NormType
from anystereo_tpu.nn.layers import ConvNormAct, Conv2x, make_norm

Dtype = Any


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual block: 1x1 expand → 3x3 depthwise →
    1x1 project, residual when stride 1 and channels match."""

    features: int
    stride: int = 1
    expand: int = 6
    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(y)
            y = make_norm(self.norm, mid, self.dtype)(y)
            y = jnp.clip(y, 0.0, 6.0)  # ReLU6
        y = nn.Conv(
            mid,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = make_norm(self.norm, mid, self.dtype)(y)
        y = jnp.clip(y, 0.0, 6.0)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


# (expansion, channels, repeats, first-stride) rows of mobilenetv2_100's
# blocks 0..5 — block 6 (320ch) is unused by the reference split
# (extractor.py:332: layers = [1,2,3,5,6]).
_MBV2_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
)


class MobileNetV2Trunk(nn.Module):
    """Returns (x2, x4, x8, x16, x32) intermediate maps with channels
    (16, 24, 32, 96, 160) — the split points of Feature (extractor.py:349-355)."""

    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        y = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(x)
        y = make_norm(self.norm, 32, self.dtype)(y)
        y = jnp.clip(y, 0.0, 6.0)
        taps: List[jnp.ndarray] = []
        for si, (t, c, n, s) in enumerate(_MBV2_STAGES):
            for bi in range(n):
                y = InvertedResidual(
                    c, stride=s if bi == 0 else 1, expand=t, norm=self.norm,
                    dtype=self.dtype,
                )(y)
            taps.append(y)
        x2, x4, x8, x16a, x16b, x32 = (
            taps[0], taps[1], taps[2], taps[3], taps[4], taps[5],
        )
        return x2, x4, x8, x16b, x32  # stage-4 output (96ch) is the 1/16 tap


class FeaturePyramid(nn.Module):
    """Feature (extractor.py:327-362): trunk + top-down Conv2x fusion.

    Returns [f4 (48ch, 1/4), f8 (64, 1/8), f16 (192, 1/16), f32 (160, 1/32)].
    """

    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x2, x4, x8, x16, x32 = MobileNetV2Trunk(self.norm, self.dtype)(x)
        f16 = Conv2x(96, deconv=True, norm=NormType.INSTANCE, dtype=self.dtype)(
            x32, x16
        )  # 192ch
        f8 = Conv2x(32, deconv=True, norm=NormType.INSTANCE, dtype=self.dtype)(
            f16, x8
        )  # 64ch
        f4 = Conv2x(24, deconv=True, norm=NormType.INSTANCE, dtype=self.dtype)(
            f8, x4
        )  # 48ch
        f4 = ConvNormAct(
            48, 3, stride=1, padding=1, norm=NormType.INSTANCE, dtype=self.dtype
        )(f4)
        return [f4, f8, f16, x32]


class ResidualBlock(nn.Module):
    """extractor.py:10-64 — two 3x3 convs + skip (1x1 projection when the
    shape changes)."""

    features: int
    stride: int = 1
    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), dtype=self.dtype,
        )(x)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(y)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        y = nn.relu(y)
        if self.stride != 1 or in_ch != self.features:
            x = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype,
            )(x)
            x = make_norm(self.norm, self.features, self.dtype)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT matching encoder (extractor.py:126-198): 7x7 stem + 3 residual
    stages + 1x1 head; instance norm; stride layout set by `downsample`
    (n_downsample=2 → output at 1/4)."""

    output_dim: int = 256
    downsample: int = 2
    norm: NormType = NormType.INSTANCE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s1 = 1 + (self.downsample > 2)
        y = nn.Conv(
            64, (7, 7), strides=(s1, s1), padding=((3, 3), (3, 3)), dtype=self.dtype
        )(x)
        y = make_norm(self.norm, 64, self.dtype)(y)
        y = nn.relu(y)
        for ch, s in ((64, 1), (96, 1 + (self.downsample > 1)), (128, 1 + (self.downsample > 0))):
            y = ResidualBlock(ch, stride=s, norm=self.norm, dtype=self.dtype)(y)
            y = ResidualBlock(ch, stride=1, norm=self.norm, dtype=self.dtype)(y)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype)(y)


class MultiBasicEncoder(nn.Module):
    """Context encoder (extractor.py:200-304).

    Returns [(net, inp)] per GRU level ordered [1/4, 1/8, 1/16][:n_layers]:
    hidden-state init (tanh applied by the caller) and context features.
    output heads: 1/4 and 1/8 use ResidualBlock+Conv, 1/16 a bare conv.
    """

    hidden_dims: Sequence[int] = (128, 128, 128)  # (1/16, 1/8, 1/4) dims in ref order
    context_dims: Sequence[int] = (128, 128, 128)
    n_layers: int = 3
    downsample: int = 2
    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        s1 = 1 + (self.downsample > 2)
        y = nn.Conv(
            64, (7, 7), strides=(s1, s1), padding=((3, 3), (3, 3)), dtype=self.dtype
        )(x)
        y = make_norm(self.norm, 64, self.dtype)(y)
        y = nn.relu(y)
        for ch, s in ((64, 1), (96, 1 + (self.downsample > 1)), (128, 1 + (self.downsample > 0))):
            y = ResidualBlock(ch, stride=s, norm=self.norm, dtype=self.dtype)(y)
            y = ResidualBlock(ch, stride=1, norm=self.norm, dtype=self.dtype)(y)
        x04 = y

        def head(z, dim, with_res, name):
            if with_res:
                z = ResidualBlock(128, stride=1, norm=self.norm, dtype=self.dtype,
                                  name=f"{name}_res")(z)
            return nn.Conv(dim, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name=f"{name}_conv")(z)

        # hidden_dims/context_dims indexed as the reference does:
        # dim[2] at 1/4, dim[1] at 1/8, dim[0] at 1/16 (extractor.py:236-252)
        out = [
            (
                head(x04, self.hidden_dims[2], True, "net04"),
                head(x04, self.context_dims[2], True, "inp04"),
            )
        ]
        if self.n_layers == 1:
            return out
        x08 = x04
        for s, name in ((2, "l4a"), (1, "l4b")):
            x08 = ResidualBlock(128, stride=s, norm=self.norm, dtype=self.dtype)(x08)
        out.append(
            (
                head(x08, self.hidden_dims[1], True, "net08"),
                head(x08, self.context_dims[1], True, "inp08"),
            )
        )
        if self.n_layers == 2:
            return out
        x16 = x08
        for s in (2, 1):
            x16 = ResidualBlock(128, stride=s, norm=self.norm, dtype=self.dtype)(x16)
        out.append(
            (
                head(x16, self.hidden_dims[0], False, "net16"),
                head(x16, self.context_dims[0], False, "inp16"),
            )
        )
        return out
