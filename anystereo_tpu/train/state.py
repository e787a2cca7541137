"""Train state + checkpointing.

The reference checkpoints model weights only (torch.save(state_dict),
train_continuous_IGEV.py:243-245) so resume restarts the optimizer and LR
schedule (SURVEY.md §5).  Here the FULL state (params, opt_state, step) is
checkpointed with Orbax, multi-host-aware and async-capable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # frozen-BatchNorm running statistics (reference regime): constant
    # through training (the reference freezes every BN for the whole run,
    # train_continuous_IGEV.py:203) but must ride along so apply() sees
    # them and checkpoints carry them.  None for the GroupNorm default.
    batch_stats: Any = None

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params, opt_state=opt_state)


def create_train_state(
    params, tx: optax.GradientTransformation, batch_stats=None
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        batch_stats=batch_stats,
    )


# --------------------------------------------------------------------- #
# Orbax checkpointing (full state, unlike the reference's weights-only)
# --------------------------------------------------------------------- #


def save_checkpoint(
    ckpt_dir: str, state: TrainState, keep: int = 5, batch_stats=None
) -> None:
    """Full-state checkpoint.  Pass `batch_stats` when the model carries a
    frozen-BatchNorm collection (reference regime) — eval from a trainer
    checkpoint needs the running statistics, not model-init ones."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    )
    items = dict(
        params=ocp.args.StandardSave(state.params),
        opt_state=ocp.args.StandardSave(state.opt_state),
    )
    stats = batch_stats if batch_stats is not None else state.batch_stats
    if stats:
        items["batch_stats"] = ocp.args.StandardSave(stats)
    mngr.save(int(state.step), args=ocp.args.Composite(**items))
    mngr.wait_until_finished()
    mngr.close()


def restore_checkpoint(
    ckpt_dir: str, state: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore params+opt_state into an existing (abstract or concrete)
    state; filtered partial restore of params-only checkpoints is handled by
    `restore_params_only`."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step() if step is None else step
    items = dict(
        params=ocp.args.StandardRestore(state.params),
        opt_state=ocp.args.StandardRestore(state.opt_state),
    )
    if state.batch_stats is not None:
        items["batch_stats"] = ocp.args.StandardRestore(state.batch_stats)
    restored = mngr.restore(step, args=ocp.args.Composite(**items))
    mngr.close()
    return state.replace(
        step=jnp.asarray(step, jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"]
        if state.batch_stats is not None
        else None,
    )


def restore_eval_variables(ckpt_dir: str, variables, step: Optional[int] = None):
    """Restore params (filtered) plus, when the checkpoint carries it, the
    batch_stats collection — needed for the frozen-BatchNorm reference
    regime (converted torch checkpoints, tools/convert_checkpoint.py)."""
    import os

    import orbax.checkpoint as ocp

    out = {"params": restore_params_only(ckpt_dir, variables["params"], step)}
    if "batch_stats" in variables:
        try:
            path = os.path.abspath(ckpt_dir)
            mngr = ocp.CheckpointManager(path)
            s = mngr.latest_step() if step is None else step
            restored = mngr.restore(
                s,
                args=ocp.args.Composite(
                    batch_stats=ocp.args.StandardRestore(variables["batch_stats"])
                ),
            )["batch_stats"]
            mngr.close()
            out["batch_stats"] = restored
        except Exception as e:
            # trainer checkpoints carry params+opt_state only — falling
            # back to model-init batch_stats is WRONG for frozen-BN eval
            # (mean=0/var=1 normalizes with garbage).  Never do it
            # silently: the caller must know these metrics are suspect.
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint %s has no restorable batch_stats (%s); using "
                "model-init statistics — FROZEN_BATCH eval metrics will "
                "be meaningless unless the backbone was converted with "
                "its running stats",
                ckpt_dir,
                e,
            )
            out["batch_stats"] = variables["batch_stats"]
    return out


def restore_params_only(ckpt_dir: str, params, step: Optional[int] = None):
    """Weight-only restore with key filtering against the current model —
    the reference's restore semantics (train_continuous_IGEV.py:192-200),
    for warm-starting from a differently-configured run.

    The checkpoint is restored WITHOUT a target (StandardRestore with a
    target raises when the target has keys the checkpoint lacks), then
    merged by key path: donor leaves whose path and shape match the
    current model load; everything else keeps its fresh init."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step() if step is None else step
    restored = mngr.restore(
        step, args=ocp.args.Composite(params=ocp.args.StandardRestore())
    )["params"]
    mngr.close()

    keystr = jax.tree_util.keystr
    flat_new = {
        keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(restored)
    }

    def merge(path, v):
        new = flat_new.get(keystr(path))
        if new is not None and tuple(new.shape) == tuple(v.shape):
            return jnp.asarray(new, v.dtype)
        return v

    return jax.tree_util.tree_map_with_path(merge, params)
