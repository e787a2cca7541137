"""Profiling / observability utilities — the subsystem the reference lacks
(SURVEY.md §5: wall-clock brackets + an unused fvcore import,
evaluation.py:23,234-236).

  * `device_timer` — honest latency measurement.  On the tunneled axon
    platform `jax.block_until_ready` can return before execution finishes
    (measured 0.4 ms for a 5.7 s graph), so timing forces a host transfer.
  * `trace` — jax.profiler trace context (xplane dumps for xprof/TB).
  * `roofline` — per-kernel achieved-rate report from a CostEstimate-style
    spec, for checking Pallas kernels against VPU/MXU/HBM ceilings.
  * `count_params`, `flops_estimate` — startup reporting (the reference
    prints a parameter count, train_continuous_IGEV.py:185).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Compiler-reported FLOPs of one call (the working version of the
    reference's never-invoked fvcore FlopCountAnalysis, evaluation.py:23)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # per-device list on some backends
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def device_timer(fn: Callable, *args, n: int = 3, warmup: int = 1) -> float:
    """Median seconds per call with a host round-trip on the output."""
    for _ in range(warmup):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    times = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        times.append(time.time() - t0)
    return float(np.median(times))


def pipelined_per_call(apply_fn, args, k: int = 6, reps: int = 2):
    """Steady-state device seconds per call via K-vs-1 scan differencing —
    the canonical timing harness shared by bench.py and
    tools/profile_stages.py (measurement rules in docs/PERF.md).

    `apply_fn(c, *args)` runs one application with the scalar fp32 carry
    perturbation `c` folded into its inputs (so XLA cannot collapse or
    parallelize the scan repetitions) and returns any pytree.  K
    applications are chained through the carry; the K-vs-1 timing
    difference cancels both the dev tunnel's RTT and the output-transfer
    cost.  Each timing forces a host transfer of the scalar carry because
    `jax.block_until_ready` is unreliable on the tunneled axon platform
    (measured returning in 0.4 ms for a 5.7 s graph).

    Returns (per_call_s, aux) with aux = {"t1", "tk", "compile_s",
    "first_out"}.  `first_out` is the (device-resident) output pytree of
    the FIRST scan iteration (carry = 0) — callers must allclose it
    against a direct apply_fn(0, *args) so a wrong-but-finite numerical
    regression in the chained steady-state path cannot post a good
    number while computing garbage.
    """
    if k < 2:
        raise ValueError(f"k-vs-1 differencing needs k >= 2, got k={k}")
    import jax.numpy as jnp

    def chain(n):
        def run(*a):
            def body(c, _):
                outs = apply_fn(c, *a)
                s = sum(
                    jnp.sum(x.astype(jnp.float32)) * 1e-20
                    for x in jax.tree_util.tree_leaves(outs)
                )
                return c + s, ()

            def first(c, _):
                # first iteration also surfaces its outputs for the
                # caller's chained-vs-direct validation
                outs = apply_fn(c, *a)
                s = sum(
                    jnp.sum(x.astype(jnp.float32)) * 1e-20
                    for x in jax.tree_util.tree_leaves(outs)
                )
                return c + s, outs

            c0 = jnp.float32(0)
            c0, outs0 = first(c0, None)
            if n > 1:
                c0, _ = jax.lax.scan(body, c0, None, length=n - 1)
            return c0, outs0

        return jax.jit(run)

    f1, fk = chain(1), chain(k)
    t0 = time.time()
    c, first_out = f1(*args)
    np.asarray(c)
    np.asarray(fk(*args)[0])
    compile_s = time.time() - t0

    def best(fn):
        b = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(*args)[0])
            b = min(b, time.time() - t0)
        return b

    t1, tk = best(f1), best(fk)
    per = (tk - t1) / (k - 1)
    return per, {"t1": t1, "tk": tk, "compile_s": compile_s,
                 "first_out": first_out}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with xprof / tensorboard-profile."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# rough single-chip ceilings for TPU v5e (public figures)
V5E_PEAK = {
    # 197 TFLOP/s is the v5e bf16 MXU peak (394e12 is the int8 figure)
    "bf16_flops": 197e12,
    "f32_flops": 49e12,  # MXU fp32-equivalent via passes
    "vpu_f32_flops": 1.6e12,
    "hbm_bytes_per_s": 819e9,
}


@dataclasses.dataclass
class KernelSpec:
    name: str
    flops: float
    bytes_accessed: float
    unit: str = "vpu_f32_flops"


def roofline(spec: KernelSpec, measured_s: float,
             peaks: Optional[Dict[str, float]] = None) -> Dict[str, float]:
    """Achieved fraction of the compute and bandwidth ceilings."""
    peaks = peaks or V5E_PEAK
    achieved_flops = spec.flops / measured_s
    achieved_bw = spec.bytes_accessed / measured_s
    return {
        "seconds": measured_s,
        "gflops": achieved_flops / 1e9,
        "compute_frac": achieved_flops / peaks[spec.unit],
        "gbytes_per_s": achieved_bw / 1e9,
        "bandwidth_frac": achieved_bw / peaks["hbm_bytes_per_s"],
    }
