"""The training driver: data → sharded train step → logging → checkpoints →
periodic validation.

Spec: train() (train_continuous_IGEV.py:183-281): AdamW+OneCycle, grad-clip
1.0, bf16, checkpoint every valid_fre steps + at the end; Logger console/TB
running means every sum_fre steps (:137-180).  Differences by design:
full-state checkpoints (resume keeps the schedule), pjit-DP instead of
DataParallel, and a host-side prefetch loader.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anystereo_tpu.config import Config
from anystereo_tpu.nn.model import AnyStereo
from anystereo_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from anystereo_tpu.train.optimizer import make_optimizer
from anystereo_tpu.train.state import TrainState, create_train_state, save_checkpoint
from anystereo_tpu.train.step import make_train_step

log = logging.getLogger(__name__)


class MetricLogger:
    """Running-mean console/TensorBoard logger (Logger,
    train_continuous_IGEV.py:137-180)."""

    def __init__(self, log_every: int = 100, tb_dir: Optional[str] = None):
        self.log_every = log_every
        self.running: Dict[str, float] = {}
        self.count = 0
        self.writer = None
        if tb_dir is not None:
            try:
                import tensorflow as tf  # summary API

                self.writer = tf.summary.create_file_writer(tb_dir)
            except Exception:  # tensorboard optional
                log.warning("tensorboard unavailable; console logging only")

    def push(self, step: int, metrics: Dict[str, jnp.ndarray]) -> None:
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        self.count += 1
        if self.writer is not None:
            import tensorflow as tf

            with self.writer.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"train/{k}", float(v), step=step)
        if self.count == self.log_every:
            means = {k: v / self.count for k, v in self.running.items()}
            log.info(
                "step %d | %s",
                step,
                " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())),
            )
            self.running, self.count = {}, 0


def _loader_state_path(ckpt_dir: str, step: int) -> str:
    """Sidecar file carrying the grain iterator state for `step` (per-host:
    each process owns its shard's iteration order)."""
    import os

    pid = jax.process_index()
    return os.path.join(ckpt_dir, f"loader_state-{step}-p{pid}.bin")


def _save_loader_state(ckpt_dir: str, step: int, state_bytes) -> None:
    """Persist the checkpointable iterator state (as captured by
    CheckpointablePrefetch — next fetch is the batch for `step`) next to
    the orbax step, pruning THIS host's sidecars whose checkpoint step was
    garbage-collected (other hosts own their -p<pid> files; racing on a
    shared glob would cross-delete)."""
    import glob
    import os

    if isinstance(state_bytes, str):
        state_bytes = state_bytes.encode()
    with open(_loader_state_path(ckpt_dir, step), "wb") as f:
        f.write(state_bytes)
    kept = {e.name for e in os.scandir(ckpt_dir) if e.name.isdigit()}
    pid = jax.process_index()
    for p in glob.glob(os.path.join(ckpt_dir, f"loader_state-*-p{pid}.bin")):
        s = os.path.basename(p).split("-")[1]
        if s not in kept and s != str(step):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass


def train(
    cfg: Config,
    loader,
    validate_fn: Optional[Callable[[TrainState, int], Dict[str, float]]] = None,
    state: Optional[TrainState] = None,
    max_steps: Optional[int] = None,
    warm_start: Optional[str] = None,
) -> TrainState:
    """Run the training loop.  `loader` yields numpy batches with the
    make_train_step contract; `validate_fn(state, step)` runs held-out
    validation (the in-training validate_* of SURVEY §2.7).

    `warm_start`: checkpoint directory to load model weights from before
    training starts — the reference's --restore_ckpt fine-tune flow
    (filtered params-only load, schedule starts fresh at step 0,
    train_continuous_IGEV.py:192-200).  A converted torch checkpoint
    (tools/convert_checkpoint.py) works here.  Full-state auto-resume from
    cfg.train.ckpt_dir still takes precedence when that directory already
    holds steps."""
    model = AnyStereo(cfg.model)
    use_mesh = cfg.mesh.data * max(cfg.mesh.spatial, 1) > 1
    mesh = make_mesh(cfg.mesh) if use_mesh and jax.device_count() > 1 else None

    from anystereo_tpu.data.loader import device_prefetch

    raw_it = iter(loader)
    # A checkpointable iterator (grain: get_state/set_state) goes through
    # CheckpointablePrefetch: one-batch device prefetch with the iterator
    # state snapshotted around every fetch, so checkpoints save the state
    # paired with the batch actually consumed (plain device_prefetch would
    # run ahead and make the saved state off by the prefetch depth).
    from anystereo_tpu.data.loader import CheckpointablePrefetch

    ckptable_loader = hasattr(raw_it, "get_state") and hasattr(
        raw_it, "set_state"
    )
    place = None if mesh is None else (lambda x: x)  # mesh shards per step
    if ckptable_loader:
        it = CheckpointablePrefetch(raw_it, place=place)
    elif mesh is None:
        it = device_prefetch(raw_it)
    else:
        it = raw_it
    first = next(it)

    if state is None:
        variables = jax.jit(
            lambda k, b: model.init(
                k,
                b["left"],
                b["right"],
                iters=1,
                coords=b.get("coords"),
                scale=b.get("scale"),
            )
        )(jax.random.PRNGKey(cfg.train.seed), first)
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        log.info("parameter count: %.2fM", n_params / 1e6)
        tx = make_optimizer(
            cfg.train.lr,
            cfg.train.weight_decay,
            cfg.train.num_steps,
            cfg.train.grad_clip,
            cfg.train.warmup_frac,
            skip_nonfinite=cfg.train.skip_nonfinite,
        )
        import os

        def _has_steps(d: str) -> bool:
            return os.path.isdir(d) and any(
                e.name.isdigit() for e in os.scandir(d)
            )

        resume_available = _has_steps(cfg.train.ckpt_dir)
        if warm_start is not None:
            # Fail clearly on a typo'd/empty directory before paying the
            # orbax deep-restore error, and refuse the silent-no-op trap
            # where auto-resume from the SAME directory would immediately
            # override the warm start (the reference's --restore_ckpt
            # fine-tune flow needs a fresh ckpt_dir).
            if not _has_steps(warm_start):
                raise ValueError(
                    f"--restore directory {warm_start!r} has no checkpoint "
                    "steps (expected numbered orbax step subdirectories)"
                )
            if os.path.abspath(warm_start) == os.path.abspath(
                cfg.train.ckpt_dir
            ):
                raise ValueError(
                    f"--restore and ckpt_dir are the same directory "
                    f"({warm_start!r}): auto-resume would restore the full "
                    "donor state over the warm start and run the schedule "
                    "from the donor's step — pass a fresh --ckpt-dir for "
                    "fine-tunes"
                )
            if resume_available:
                log.warning(
                    "ckpt_dir %s already holds checkpoint steps — "
                    "auto-resume takes precedence and the warm start from "
                    "%s is DISCARDED (expected when resuming a preempted "
                    "fine-tune; otherwise pass a fresh --ckpt-dir)",
                    cfg.train.ckpt_dir,
                    warm_start,
                )
            else:
                from anystereo_tpu.train.state import restore_eval_variables

                loaded = restore_eval_variables(warm_start, variables)
                variables = {**variables, **loaded}
                log.info("warm-started weights from %s", warm_start)
        state = create_train_state(
            variables["params"], tx, batch_stats=variables.get("batch_stats")
        )
        # auto-resume: full state (params + optimizer + schedule position) —
        # the reference restores weights only and restarts its schedule
        # (SURVEY §5); here resume continues exactly where it stopped.
        from anystereo_tpu.train.state import restore_checkpoint

        if resume_available:
            state = restore_checkpoint(cfg.train.ckpt_dir, state)
            log.info("resumed from step %d", int(state.step))
            if ckptable_loader:
                lp = _loader_state_path(cfg.train.ckpt_dir, int(state.step))
                if os.path.exists(lp):
                    with open(lp, "rb") as f:
                        raw_it.set_state(f.read())
                    # rebuild the prefetch wrapper over the restored order
                    # (its buffered batch predates the set_state)
                    it = CheckpointablePrefetch(raw_it, place=place)
                    first = next(it)
                    log.info("restored loader state from %s", lp)
                else:
                    log.warning(
                        "no loader state saved for step %d — the data "
                        "order restarts from epoch 0 on this resume",
                        int(state.step),
                    )
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    step_fn = make_train_step(model, cfg.train, mesh=mesh, mesh_cfg=cfg.mesh)
    logger = MetricLogger(log_every=100)

    total = max_steps or cfg.train.num_steps
    start = int(state.step)
    t0 = time.time()
    batch = first

    # Preemption / failure handling — absent in the reference (SURVEY §5:
    # recovery is manual --restore_ckpt).  SIGTERM/SIGINT requests a clean
    # checkpoint-and-stop; an exception mid-run saves an emergency
    # checkpoint before re-raising, and auto-resume picks it up.
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        log.warning("signal %s received — will checkpoint and stop", signum)
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # non-main thread
            pass

    try:
        for i in range(start, total):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            try:
                state, metrics = step_fn(state, batch)
            except Exception:
                log.exception("step %d failed — saving emergency checkpoint", i)
                # the emergency save must never mask the real failure: a
                # checkpoint at this step may already exist (fail right
                # after resume) and orbax raises on duplicate steps
                try:
                    save_checkpoint(cfg.train.ckpt_dir, state)
                    if ckptable_loader:
                        # state.step == i and the failed batch was i's, so
                        # the sidecar must point at batch i (replay it),
                        # not at the batch after it
                        _save_loader_state(
                            cfg.train.ckpt_dir,
                            int(state.step),
                            it.state_of_current,
                        )
                except Exception:
                    log.exception("emergency checkpoint failed")
                raise
            logger.push(int(i), metrics)
            skips = metrics.get("nonfinite_skips")
            if skips is not None and int(skips) > 0:
                if int(skips) == 1:
                    log.warning(
                        "step %d: nonfinite gradients — update skipped "
                        "(loss=%s grad_norm=%s)",
                        i, float(metrics["loss"]), float(metrics["grad_norm"]),
                    )
                if int(skips) >= cfg.train.max_consecutive_nonfinite:
                    # the guard keeps params finite by no-op'ing bad steps;
                    # persistent badness is divergence — stop loudly with
                    # the last finite state checkpointed instead of burning
                    # the remaining budget on no-ops
                    log.error(
                        "training diverged: %d consecutive nonfinite steps "
                        "— saving emergency checkpoint and aborting", int(skips),
                    )
                    try:
                        jax.block_until_ready(state.params)
                        save_checkpoint(cfg.train.ckpt_dir, state)
                        if ckptable_loader:
                            _save_loader_state(
                                cfg.train.ckpt_dir,
                                int(state.step),
                                it.state_after_current,
                            )
                    except Exception:
                        # never mask the divergence signal (e.g. orbax
                        # duplicate-step right after a resume)
                        log.exception("divergence checkpoint failed")
                    raise RuntimeError(
                        f"training diverged at step {i}: "
                        f"{int(skips)} consecutive nonfinite gradient steps "
                        f"(params remain finite; checkpoint saved to "
                        f"{cfg.train.ckpt_dir})"
                    )
            if (i + 1) % cfg.train.ckpt_every == 0 or i + 1 == total or (
                stop_requested["flag"]
            ):
                jax.block_until_ready(state.params)
                save_checkpoint(cfg.train.ckpt_dir, state)
                if ckptable_loader:
                    _save_loader_state(
                        cfg.train.ckpt_dir,
                        int(state.step),
                        it.state_after_current,
                    )
                if validate_fn is not None and not stop_requested["flag"]:
                    results = validate_fn(state, i + 1)
                    log.info("validation @%d: %s", i + 1, results)
            if stop_requested["flag"]:
                log.info("stopping at step %d on request", i + 1)
                break
            if i + 1 < total:
                batch = next(it)
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
    dt = time.time() - t0
    steps_done = max(total - start, 0)
    log.info(
        "trained %d steps in %.1fs (%.2f steps/s)",
        steps_done, dt, steps_done / max(dt, 1e-9),
    )
    return state
