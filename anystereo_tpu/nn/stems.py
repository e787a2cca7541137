"""High-frequency stem branches producing 1/2- and 1/4-resolution latents
that (a) sharpen the matching features and (b) feed the implicit decoder.

Spec: agg_type selection at continuous_IGEVstereo.py:106-158 /
prune_raft_stereo.py:110-180, HighRes_Aggregation* at submodule.py:190-252.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from anystereo_tpu.config import AggregationType, NormType
from anystereo_tpu.nn.layers import ConvNormAct, LayerNorm2d, make_norm, pixel_unshuffle
from anystereo_tpu.ops.sampling import global_avg_pool

Dtype = Any


class HighResAggregation(nn.Module):
    """submodule.py:190-252: PixelUnshuffle(2) embed → squeeze-excite gate
    (global-avg-pool + 1x1 conv, multiplied back) → 3x3 head with the
    variant's norm/activation.  type3: IN+ReLU; type4: LayerNorm2d+ReLU;
    type5 (default): LayerNorm2d+GELU."""

    features: int
    head_norm: str = "layer"  # 'instance' (type3) | 'layer' (type4/5)
    head_act: str = "gelu"  # 'relu' (type3/4) | 'gelu' (type5)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = pixel_unshuffle(x, 2)
        y = ConvNormAct(
            self.features, 3, stride=1, padding=1, norm=NormType.INSTANCE,
            act="leaky", dtype=self.dtype,
        )(y)
        gate = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype)(
            global_avg_pool(y)
        )
        y = y * gate
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(y)
        if self.head_norm == "layer":
            y = LayerNorm2d(self.features)(y)
        else:
            y = make_norm(NormType.INSTANCE, self.features, self.dtype)(y)
        if self.head_act == "gelu":
            return nn.gelu(y, approximate=False)  # torch nn.GELU() is exact erf
        return nn.relu(y)


class UnshuffleStem(nn.Module):
    """type1/type2 stems: PixelUnshuffle + BasicConv_IN + conv+IN+ReLU
    (continuous_IGEVstereo.py:107-118)."""

    features: int
    unshuffle: bool = True
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.unshuffle:
            x = pixel_unshuffle(x, 2)
        y = ConvNormAct(
            self.features, 3, stride=self.stride, padding=1,
            norm=NormType.INSTANCE, act="leaky", dtype=self.dtype,
        )(x)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(y)
        y = make_norm(NormType.INSTANCE, self.features, self.dtype)(y)
        return nn.relu(y)


class IgevStem(nn.Module):
    """'IGEV' agg_type (RAFT core only, prune_raft_stereo.py:110-120):
    strided BasicConv_IN + conv+IN+ReLU."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(
            self.features, 3, stride=2, padding=1, norm=NormType.INSTANCE,
            act="leaky", dtype=self.dtype,
        )(x)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(y)
        y = make_norm(NormType.INSTANCE, self.features, self.dtype)(y)
        return nn.relu(y)


class StemBranch(nn.Module):
    """The full stem stack for one image.  Returns (stem_1x, stem_2x,
    stem_4x); stem_1x is None except for type2."""

    agg_type: AggregationType
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        t = self.agg_type
        if t is AggregationType.NONE:
            return None, None, None
        if t is AggregationType.IGEV:
            s2 = IgevStem(32, dtype=self.dtype, name="stem_2")(x)
            s4 = IgevStem(48, dtype=self.dtype, name="stem_4")(s2)
            return None, s2, s4
        if t is AggregationType.TYPE1:
            s2 = UnshuffleStem(32, dtype=self.dtype, name="stem_2")(x)
            s4 = UnshuffleStem(48, dtype=self.dtype, name="stem_4")(s2)
            return None, s2, s4
        if t is AggregationType.TYPE2:
            s1 = UnshuffleStem(8, unshuffle=False, dtype=self.dtype, name="stem_1")(x)
            s2 = UnshuffleStem(32, dtype=self.dtype, name="stem_2")(s1)
            s4 = UnshuffleStem(48, dtype=self.dtype, name="stem_4")(s2)
            return s1, s2, s4
        head_norm = "instance" if t is AggregationType.TYPE3 else "layer"
        head_act = "gelu" if t is AggregationType.TYPE5 else "relu"
        s2 = HighResAggregation(
            32, head_norm=head_norm, head_act=head_act, dtype=self.dtype, name="stem_2"
        )(x)
        s4 = HighResAggregation(
            48, head_norm=head_norm, head_act=head_act, dtype=self.dtype, name="stem_4"
        )(s2)
        return None, s2, s4


def stem_channels(agg_type: AggregationType) -> Tuple[int, ...]:
    """Per-latent channel counts fed to the LIIF decoder, in decoder input
    order (continuous_IGEVstereo.py:119-155: `chanels`)."""
    if agg_type is AggregationType.NONE:
        return ()
    if agg_type is AggregationType.TYPE2:
        return (8, 32, 48)
    return (32, 48)
