"""Jitted training / eval steps, single-chip or mesh-sharded.

The train step is the whole of the reference's inner loop
(train_continuous_IGEV.py:212-239) as one compiled function: forward →
sequence loss (+ optional init-disp supervision) → grad → clip → AdamW →
schedule.  Under a mesh, the batch is sharded over the `data` axis and XLA
inserts the gradient psum (pjit data parallelism — the reference's
DataParallel/NCCL analog, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh

from anystereo_tpu.config import MeshConfig, TrainConfig
from anystereo_tpu.parallel.mesh import batch_sharding, replicated
from anystereo_tpu.train.loss import (
    init_disp_loss,
    sequence_loss_queries,
)
from anystereo_tpu.train.state import TrainState


def make_train_step(
    model,
    tcfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    mesh_cfg: Optional[MeshConfig] = None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Returns step(state, batch) -> (state, metrics).

    batch keys: left/right [B,H,W,3]; coords [B,Q,2]; gt [B,Q] (query-space
    GT disparity); valid [B,Q]; scale [B]; gt_low [B,H/4,W/4] (1/4-res GT
    divided by 4*scale — only read when supervise_init).
    """

    def grad_fn(state: TrainState, batch: Dict):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                # frozen-BN statistics: constant (never updated), but the
                # collection must be present for apply (reference regime)
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables,
                batch["left"],
                batch["right"],
                iters=tcfg.train_iters,
                coords=batch["coords"],
                scale=batch["scale"],
                mode="train",
            )
            loss, metrics = sequence_loss_queries(
                out.disp_preds,
                batch["gt"],
                batch["valid"],
                max_disp=tcfg.max_disp_loss,
                gamma=tcfg.loss_gamma,
            )
            if tcfg.supervise_init and out.init_disp is not None:
                loss = loss + init_disp_loss(
                    out.init_disp, batch["gt_low"], tcfg.max_disp_loss
                )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return metrics, grads

    def _with_skips(metrics: Dict, new_state: TrainState) -> Dict:
        from anystereo_tpu.train.optimizer import SkipNonFiniteState

        if isinstance(new_state.opt_state, SkipNonFiniteState):
            # consecutive nonfinite-skipped steps — the trainer aborts
            # loudly when this exceeds tcfg.max_consecutive_nonfinite
            metrics["nonfinite_skips"] = new_state.opt_state.notfinite_count
        return metrics

    split = tcfg.split_opt_step
    if split is None:
        # axon-TPU regression workaround (see TrainConfig.split_opt_step):
        # the fused fwd+bwd+optimizer program NaNs on that runtime
        split = jax.default_backend() == "tpu"

    if split:
        # Two programs: grads (fwd+bwd+metrics) and optimizer apply.  The
        # grads stay on device between the two dispatches; state cannot be
        # donated to the grad program (apply still reads it) but is donated
        # to the apply program together with the grads.
        def apply_fn(state: TrainState, grads):
            return state.apply_gradients(grads)

        if mesh is None:
            jg = jax.jit(grad_fn)
            ja = jax.jit(apply_fn, donate_argnums=(0, 1))
        else:
            repl = replicated(mesh)
            jg = jax.jit(grad_fn, out_shardings=(repl, repl))
            ja = jax.jit(apply_fn, out_shardings=repl, donate_argnums=(0, 1))

        def step_split(state: TrainState, batch: Dict):
            metrics, grads = jg(state, batch)
            new_state = ja(state, grads)
            return new_state, _with_skips(metrics, new_state)

        return step_split

    def step(state: TrainState, batch: Dict):
        metrics, grads = grad_fn(state, batch)
        new_state = state.apply_gradients(grads)
        return new_state, _with_skips(metrics, new_state)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    # Under a mesh, input shardings are taken from the arguments' placement
    # (device_put the state replicated and the batch sharded — see
    # parallel.mesh.shard_batch / __graft_entry__.dryrun_multichip); GSPMD
    # propagates them and inserts the gradient psum + any halo exchanges.
    repl = replicated(mesh)
    return jax.jit(step, out_shardings=(repl, repl), donate_argnums=(0,))


def make_eval_step(model, valid_iters: int = 32, mesh: Optional[Mesh] = None):
    """Jitted inference: (params, left, right, coords, scale) → disparity at
    the queried coordinates [B, Q]."""

    def step(params, left, right, coords, scale):
        out = model.apply(
            {"params": params},
            left,
            right,
            iters=valid_iters,
            coords=coords,
            scale=scale,
            mode="eval",
        )
        return out.disp_final

    if mesh is None:
        return jax.jit(step)
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data, data),
        out_shardings=data,
    )
