"""Training losses.

Spec: train_continuous_IGEV.py —
  * sequence_loss (:37-65): exponentially-weighted L1 over GRU iterates,
    weight gamma'^(N-1-i) with gamma' = gamma^(15/(N-1));
  * sequence_loss_multiscale (:68-94): the same on flattened query tensors;
  * sequence_loss_multiscale_superinit (:96-122): adds a smooth-L1 term on
    the regressed initial disparity vs 1/4-res GT (--supervise_init).

All losses mask by (valid >= 0.5) & (|gt| < max_disp) as the reference does
(:47-48), compute in fp32, and return (loss, metrics-dict).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def _iter_weights(n: int, gamma: float) -> jnp.ndarray:
    """gamma' = gamma**(15/(n-1)); w_i = gamma'**(n-1-i)  (:49-51)."""
    if n > 1:
        adj = gamma ** (15.0 / (n - 1))
    else:
        adj = gamma
    i = jnp.arange(n, dtype=jnp.float32)
    return adj ** (n - 1 - i)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch F.smooth_l1_loss elementwise (beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def sequence_loss_queries(
    disp_preds: jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray,
    max_disp: float = 700.0,
    gamma: float = 0.9,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Query-space sequence loss (sequence_loss_multiscale, :68-94).

    disp_preds: [iters, B, Q]; gt, valid: [B, Q].
    """
    n = disp_preds.shape[0]
    gt = gt.astype(jnp.float32)
    mask = ((valid >= 0.5) & (jnp.abs(gt) < max_disp)).astype(jnp.float32)
    w = _iter_weights(n, gamma)
    err = jnp.abs(disp_preds.astype(jnp.float32) - gt[None])  # [iters, B, Q]
    per_iter = (err * mask[None]).sum(axis=(1, 2)) / jnp.maximum(mask.sum(), 1.0)
    loss = (w * per_iter).sum()
    final_err = err[-1]
    metrics = {
        "epe": _masked_mean(final_err, mask),
        "1px": _masked_mean((final_err < 1.0).astype(jnp.float32), mask),
        "3px": _masked_mean((final_err < 3.0).astype(jnp.float32), mask),
    }
    return loss, metrics


def sequence_loss(
    disp_preds: jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray,
    max_disp: float = 700.0,
    gamma: float = 0.9,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Dense-grid sequence loss (sequence_loss, :37-65).

    disp_preds: [iters, B, H, W]; gt, valid: [B, H, W].
    """
    it, b = disp_preds.shape[0], disp_preds.shape[1]
    return sequence_loss_queries(
        disp_preds.reshape(it, b, -1),
        gt.reshape(b, -1),
        valid.reshape(b, -1),
        max_disp,
        gamma,
    )


def init_disp_loss(
    init_disp: jnp.ndarray,
    gt_low: jnp.ndarray,
    max_disp: float,
) -> jnp.ndarray:
    """Initial-disparity supervision (sequence_loss_multiscale_superinit,
    :96-122): smooth-L1 against the 1/4-res GT, masked by gt < max_disp/4.

    init_disp, gt_low: [B, H/4, W/4] (gt already divided by 4*scale by the
    data pipeline, stereo_datasets.py:151-152).
    """
    gt_low = gt_low.astype(jnp.float32)
    mask = (jnp.abs(gt_low) < max_disp / 4.0).astype(jnp.float32)
    return _masked_mean(smooth_l1(init_disp.astype(jnp.float32), gt_low), mask)
