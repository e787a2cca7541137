"""Divisibility padding for inference.

Spec: InputPadder (models/coreContinuous_IGEV/utils/utils.py:7-26) with the
`get_pad_num` method the eval code calls but the reference never defines
(evaluation_validate.py:79,96 — latent defect #4, SURVEY.md §2.9) supplied
by construction.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


class InputPadder:
    """Pads NHWC images so H and W are divisible by `divis_by`.

    mode 'sintel': split the padding evenly top/bottom and left/right;
    otherwise: all height padding at the bottom.  Replicate-edge fill
    (F.pad mode='replicate').
    """

    def __init__(self, dims: Tuple[int, ...], mode: str = "sintel", divis_by: int = 8):
        self.ht, self.wd = dims[-3:-1] if len(dims) == 4 else dims[-2:]
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            # [left, right, top, bottom] in the reference's F.pad order
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs: jnp.ndarray) -> List[jnp.ndarray]:
        l, r, t, b = self._pad
        out = [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge") for x in inputs
        ]
        return out

    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, ...] or [B, H, W]."""
        l, r, t, b = self._pad
        h, w = x.shape[1], x.shape[2]
        return x[:, t : h - b, l : w - r]

    def get_pad_num(self) -> List[int]:
        """[top, bottom, left, right] — the accessor the reference's
        arbitrary-scale eval path needs (defect #4 fixed)."""
        l, r, t, b = self._pad
        return [t, b, l, r]

    @property
    def padded_shape(self) -> Tuple[int, int]:
        l, r, t, b = self._pad
        return self.ht + t + b, self.wd + l + r
