"""Optimizer + LR schedule.

Spec: fetch_optimizer (train_continuous_IGEV.py:125-134): AdamW(lr, wd 1e-5,
eps 1e-8) under OneCycleLR(max_lr=lr, pct_start 0.01, cycle_momentum False,
anneal_strategy 'linear', total steps num_steps+100).  Gradient clipping by
global norm 1.0 happens in the optimizer chain (reference clips manually at
:234-239); AMP loss scaling is unnecessary in bf16.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SkipNonFiniteState(NamedTuple):
    """State of :func:`skip_nonfinite_updates`.

    notfinite_count: CONSECUTIVE steps skipped for nonfinite grads (resets
        to 0 on the first finite step).
    total_notfinite: lifetime count of skipped steps.
    inner_state: the wrapped optimizer's state, untouched by skipped steps.
    """

    notfinite_count: jnp.ndarray
    total_notfinite: jnp.ndarray
    inner_state: optax.OptState


def skip_nonfinite_updates(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Never-poison analog of ``optax.apply_if_finite``.

    A step whose gradients contain NaN/inf becomes a no-op: zero updates,
    inner optimizer state (Adam moments, schedule count) untouched.  Unlike
    ``optax.apply_if_finite(max_consecutive_errors=N)`` there is NO give-up
    threshold — optax *applies the nonfinite update* once N consecutive
    errors pass, which silently poisoned every param with NaN in an observed
    divergent 2k-step run.  Persistent divergence must abort loudly instead:
    the trainer raises after ``TrainConfig.max_consecutive_nonfinite``
    consecutive skips, with the (still finite) state checkpointed.
    """

    def init_fn(params):
        return SkipNonFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update_fn(updates, state, params=None):
        finite = jnp.array(True)
        for leaf in jax.tree_util.tree_leaves(updates):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        # compute-then-select: jnp.where discards the NaN branch, so the
        # kept state/updates stay finite when finite=False
        new_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            new_inner,
            state.inner_state,
        )
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), new_updates
        )
        bad = jnp.where(finite, 0, 1).astype(jnp.int32)
        return new_updates, SkipNonFiniteState(
            notfinite_count=jnp.where(
                finite, 0, state.notfinite_count + 1
            ).astype(jnp.int32),
            total_notfinite=state.total_notfinite + bad,
            inner_state=new_inner,
        )

    return optax.GradientTransformation(init_fn, update_fn)


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
        # guard a single non-finite batch poisons the params permanently.
        # The wrapper makes such steps a no-op and counts them in
        # opt_state.notfinite_count for the trainer's divergence abort.
        opt = skip_nonfinite_updates(opt)
    return opt
