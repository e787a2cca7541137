"""Optimizer + LR schedule.

Spec: fetch_optimizer (train_continuous_IGEV.py:125-134): AdamW(lr, wd 1e-5,
eps 1e-8) under OneCycleLR(max_lr=lr, pct_start 0.01, cycle_momentum False,
anneal_strategy 'linear', total steps num_steps+100).  Gradient clipping by
global norm 1.0 happens in the optimizer chain (reference clips manually at
:234-239); AMP loss scaling is unnecessary in bf16.
"""

from __future__ import annotations

import optax


def one_cycle_schedule(
    max_lr: float, total_steps: int, pct_start: float = 0.01
) -> optax.Schedule:
    """Linear OneCycle: warm up to max_lr over pct_start, linearly anneal to
    ~0 (torch OneCycleLR(anneal_strategy='linear') shape).  The reference
    passes num_steps+100 as the cycle length (:129)."""
    total = total_steps + 100
    warm = max(int(total * pct_start), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(max_lr / 25.0, max_lr, warm),  # torch div_factor=25
            optax.linear_schedule(max_lr, max_lr / 1e4, total - warm),
        ],
        boundaries=[warm],
    )


def step_decay_schedule(base_lr: float, milestones, gamma: float = 0.5):
    """Piecewise step decay (adjust_learning_rate,
    metrics_utils/experiment.py:91-109): lr = base * gamma^(#milestones
    passed).  `milestones` in steps."""
    boundaries_and_scales = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)


def make_optimizer(
    lr: float = 2e-4,
    weight_decay: float = 1e-5,
    num_steps: int = 100_000,
    grad_clip: float = 1.0,
    pct_start: float = 0.01,
    skip_nonfinite: bool = True,
) -> optax.GradientTransformation:
    sched = one_cycle_schedule(lr, num_steps, pct_start)
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )
    if skip_nonfinite:
        # the reference's AMP GradScaler skips any step whose grads contain
        # inf/NaN (train_continuous_IGEV.py:232-239, scaler.step after
        # unscale_); bf16-on-TPU needs no loss scale, but without this
        # guard a single non-finite batch poisons the params permanently
        # (observed: the 2k-step synthetic run went all-NaN).  The wrapper
        # makes such steps a no-op and counts them in
        # opt_state.notfinite_count.
        opt = optax.apply_if_finite(opt, max_consecutive_errors=1000)
    return opt
