"""3-D cost-volume aggregation: corr stem, image-feature attention and the
3-level hourglass producing the Geometry Encoding Volume.

Spec: hourglass + FeatureAtt (continuous_IGEVstereo.py:22-89,
submodule.py:328-341), corr_stem/corr_feature_att/classifier
(continuous_IGEVstereo.py:172-176).

Volume layout: [B, D, H, W, C] (NDHWC — channels last for XLA conv;
C = gwc groups at the input).  The disparity axis participates in the 3-D
convs exactly as in the reference.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from anystereo_tpu.config import NormType
from anystereo_tpu.nn.layers import ConvNormAct

Dtype = Any


class FeatureAtt(nn.Module):
    """submodule.py:328-341: image features → 1x1 convs → sigmoid gate
    applied to the volume (broadcast over the disparity axis)."""

    cv_channels: int
    norm: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, volume, feat):
        # volume: [B, D, H, W, C]; feat: [B, H, W, C_f]
        c_f = feat.shape[-1]
        att = ConvNormAct(
            c_f // 2, 1, stride=1, padding=0, norm=self.norm, act="leaky",
            dtype=self.dtype,
        )(feat)
        att = nn.Conv(self.cv_channels, (1, 1), dtype=self.dtype)(att)
        return nn.sigmoid(att)[:, None] * volume


class _Conv3dBlock(nn.Module):
    """BasicConv(is_3d=True): conv3d → norm → LeakyReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    transpose: bool = False
    norm: NormType = NormType.INSTANCE
    act: Optional[str] = "leaky"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return ConvNormAct(
            self.features,
            kernel=self.kernel if not self.transpose else 4,
            stride=self.stride,
            padding=self.padding,
            norm=self.norm,
            act=self.act,
            transpose=self.transpose,
            dims=3,
            dtype=self.dtype,
        )(x)


class CostAggregation(nn.Module):
    """corr_stem → feature attention → hourglass → (GEV, init-disp logits).

    in_channels = gwc groups (8); the hourglass widens 2x/4x/6x down the
    three stride-2 levels with FeatureAtt gating against the image pyramid
    at 1/8, 1/16, 1/32, then deconvs back up with skip-concat + agg blocks
    (continuous_IGEVstereo.py:67-89)."""

    in_channels: int = 8
    norm: NormType = NormType.INSTANCE
    norm_2d: NormType = NormType.GROUP
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, volume, features: List[jnp.ndarray]):
        c = self.in_channels
        kw = dict(norm=self.norm, dtype=self.dtype)

        # corr_stem + gate against the 1/4 features (continuous_IGEVstereo.py:263-264)
        volume = _Conv3dBlock(c, **kw)(volume)
        volume = FeatureAtt(c, norm=self.norm_2d, dtype=self.dtype)(
            volume, features[0]
        )

        # encoder
        d1 = _Conv3dBlock(c * 2, stride=2, **kw)(volume)
        d1 = _Conv3dBlock(c * 2, **kw)(d1)
        d1 = FeatureAtt(c * 2, norm=self.norm_2d, dtype=self.dtype)(d1, features[1])

        d2 = _Conv3dBlock(c * 4, stride=2, **kw)(d1)
        d2 = _Conv3dBlock(c * 4, **kw)(d2)
        d2 = FeatureAtt(c * 4, norm=self.norm_2d, dtype=self.dtype)(d2, features[2])

        d3 = _Conv3dBlock(c * 6, stride=2, **kw)(d2)
        d3 = _Conv3dBlock(c * 6, **kw)(d3)
        d3 = FeatureAtt(c * 6, norm=self.norm_2d, dtype=self.dtype)(d3, features[3])

        # decoder with skip-concat + agg blocks
        u2 = _Conv3dBlock(c * 4, stride=2, transpose=True, **kw)(d3)
        u2 = jnp.concatenate([u2, d2], axis=-1)
        u2 = _Conv3dBlock(c * 4, kernel=1, padding=0, **kw)(u2)
        u2 = _Conv3dBlock(c * 4, **kw)(u2)
        u2 = _Conv3dBlock(c * 4, **kw)(u2)
        u2 = FeatureAtt(c * 4, norm=self.norm_2d, dtype=self.dtype)(u2, features[2])

        u1 = _Conv3dBlock(c * 2, stride=2, transpose=True, **kw)(u2)
        u1 = jnp.concatenate([u1, d1], axis=-1)
        u1 = _Conv3dBlock(c * 2, kernel=1, padding=0, **kw)(u1)
        u1 = _Conv3dBlock(c * 2, **kw)(u1)
        u1 = _Conv3dBlock(c * 2, **kw)(u1)
        u1 = FeatureAtt(c * 2, norm=self.norm_2d, dtype=self.dtype)(u1, features[1])

        gev = _Conv3dBlock(
            8, stride=2, transpose=True, norm=NormType.NONE, act=None,
            dtype=self.dtype,
        )(u1)
        return gev  # [B, D, H/4, W/4, 8] — back at the input volume's resolution
