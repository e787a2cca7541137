"""Torch-weight conversion utilities.

Enables (a) importing trained reference checkpoints for eval parity and
(b) cross-framework parity tests of individual modules (tests/test_torch_parity.py).
Layout mapping:

  torch Conv2d weight  [O, I, kh, kw]   → flax nn.Conv kernel [kh, kw, I, O]
  torch Conv3d weight  [O, I, kd, kh, kw] → [kd, kh, kw, I, O]
  torch ConvTranspose2d weight [I, O, kh, kw] → TorchConvTranspose kernel
      [kh, kw, I, O] (the module flips spatial axes internally, matching
      torch's cross-correlation-transpose semantics)
  torch Linear weight  [O, I]           → flax nn.Dense kernel [I, O]
  torch BatchNorm{2,3}d (weight, bias, running_mean, running_var)
      → FrozenBatchNorm (scale, bias) params + (mean, var) batch_stats
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """[O, I, *spatial] → [*spatial, I, O]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose: [I, O, *spatial] → [*spatial, I, O]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def frozen_bn(prefix: str, sd: Dict[str, np.ndarray]):
    """Returns (params, batch_stats) dicts for FrozenBatchNorm from a torch
    BatchNorm state_dict prefix."""
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the DataParallel 'module.' prefix the reference's checkpoints
    carry (saved from the wrapped model, train_continuous_IGEV.py:243)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
