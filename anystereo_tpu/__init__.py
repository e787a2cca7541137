"""anystereo_tpu — a TPU-native arbitrary-scale stereo-depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
Any-Stereo (github.com/Zhaohuai-L/Any-Stereo): iterative stereo matching
(RAFT-Stereo / IGEV-Stereo lineage) with a LIIF-style implicit decoder for
arbitrary-scale disparity output.

Layout conventions (TPU-native, differ from the torch reference):
  * images / feature maps are NHWC (channels-last) — XLA's preferred conv
    layout on TPU;
  * cost volumes are [B, H, W, G, D] (disparity innermost = lane dimension);
  * query coordinates are [B, Q, 2] in normalized [-1, 1] with (y, x) order
    (matching the reference's `make_coord`, liif.py:32-45);
  * compute dtype is bfloat16 with fp32 cost-volume lookups, mirroring the
    reference's AMP policy (continuous_IGEVstereo.py:276).
"""

__version__ = "0.1.0"

from anystereo_tpu.config import (  # noqa: F401
    AggregationType,
    DataConfig,
    EvalConfig,
    LiifConfig,
    ModelConfig,
    TrainConfig,
)
