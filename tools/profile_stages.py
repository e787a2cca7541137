"""Per-stage on-chip profile of the flagship eval forward.

Attributes the bench latency (bench.py protocol: IGEV eval, 384x1248,
32 GRU iterations, max_disp 192) to pipeline stages, using the two
measurement rules from docs/PERF.md:

  * all timings are pipelined device time via K-vs-1 scan differencing
    (the dev tunnel's ~30 ms RTT and ~70 ms output transfer cancel);
  * the per-iteration cost is the slope of latency vs GRU iteration
    count; the intercept is the one-time cost.

Stage ablation: partial forwards are jitted through `model.apply(...,
method=...)` so each timing runs exactly the submodules it names —
matching features (+stems), cost stage (GWC + hourglass + init disp),
context encoder, the GRU scan, and the final dense LIIF decode.

Usage:  python tools/profile_stages.py [--h 384 --w 1248 --iters 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=1248)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--k", type=int, default=6, help="chain length for differencing")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for CI dry-runs; the "
                         "JAX_PLATFORMS env var is overridden by the axon site "
                         "hook, only jax.config works)")
    ap.add_argument("--cost-breakdown", action="store_true",
                    help="additionally split the cost stage into GWC/corr "
                         "build vs 3-D aggregation vs regression+pyramid "
                         "(two extra compiles)")
    args = ap.parse_args()
    if args.k < 2:
        ap.error("--k must be >= 2 (K-vs-1 differencing)")
    if args.iters < 2:
        ap.error("--iters must be >= 2 (per-iteration slope needs two points)")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    # same A/B knob as bench.py
    overrides = json.loads(os.environ.get("ANYSTEREO_BENCH_OVERRIDES", "{}"))
    cfg = ModelConfig(**overrides)
    model = AnyStereo(cfg)
    b, h, w = 1, args.h, args.w
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)

    variables = jax.jit(
        lambda k, l, r: model.init(k, l, r, iters=1, mode="eval")
    )(jax.random.PRNGKey(0), left, right)
    jax.block_until_ready(variables)

    # ---- stage methods (mirrors of __call__'s eval path) ----------------- #

    def norm(mdl, l, r):
        return mdl._normalize(l), mdl._normalize(r)

    def m_matching(mdl, l, r):
        l, r = norm(mdl, l, r)
        return mdl._matching(l, r)

    def m_cost(mdl, l, r):
        l, r = norm(mdl, l, r)
        match_l, match_r, feats_l, stems = mdl._matching(l, r)
        pyr, init_disp = mdl._cost_stage(match_l, match_r, feats_l)
        return pyr, init_disp

    def m_context(mdl, l, r):
        l, r = norm(mdl, l, r)
        return mdl._context(l)

    def m_to_lowres(iters):
        def f(mdl, l, r):
            out = mdl(l, r, iters=iters, mode="eval")
            return out.disp_lowres

        return f

    def m_full(iters):
        def f(mdl, l, r):
            return mdl(l, r, iters=iters, mode="eval").disp_final

        return f

    # ---- differencing harness (shared with bench.py) ---------------------- #

    from anystereo_tpu.utils.profiling import pipelined_per_call

    def dev_time(method, label):
        per, aux = pipelined_per_call(
            lambda c, v, l, r: model.apply(v, l + c, r + c, method=method),
            (variables, left, right),
            k=args.k,
        )
        print(
            f"{label:32s} {per * 1000:9.2f} ms   "
            f"(compile {aux['compile_s']:6.1f} s)",
            flush=True,
        )
        return per

    results = {}
    results["matching"] = dev_time(m_matching, "matching features + stems")
    results["matching+cost"] = dev_time(m_cost, "  + cost stage (GWC/hourglass)")
    if args.cost_breakdown and cfg.core.name == "IGEV":
        from anystereo_tpu.ops.cost_volume import build_gwc_and_corr

        def m_build(mdl, l, r):
            ln, rn = norm(mdl, l, r)
            match_l, match_r, feats_l, stems = mdl._matching(ln, rn)
            return build_gwc_and_corr(
                match_l, match_r, cfg.volume_disp, cfg.gwc_groups
            )

        def m_agg(mdl, l, r):
            ln, rn = norm(mdl, l, r)
            match_l, match_r, feats_l, stems = mdl._matching(ln, rn)
            gwc, corr = build_gwc_and_corr(
                match_l, match_r, cfg.volume_disp, cfg.gwc_groups
            )
            vol = jnp.transpose(gwc, (0, 4, 1, 2, 3)).astype(mdl._dt)
            return mdl.cost_agg(vol, feats_l), corr

        results["matching+build"] = dev_time(m_build, "  + GWC/corr build only")
        results["matching+agg"] = dev_time(m_agg, "  + 3-D aggregation")
    results["context"] = dev_time(m_context, "context encoder + gates")
    it_lo, it_hi = max(1, args.iters // 4), args.iters
    results[f"lowres@{it_lo}"] = dev_time(
        m_to_lowres(it_lo), f"fwd to lowres disp, {it_lo} iters"
    )
    results[f"lowres@{it_hi}"] = dev_time(
        m_to_lowres(it_hi), f"fwd to lowres disp, {it_hi} iters"
    )
    results[f"full@{it_hi}"] = dev_time(m_full(it_hi), f"full fwd + decode, {it_hi} iters")

    per_iter = (results[f"lowres@{it_hi}"] - results[f"lowres@{it_lo}"]) / (
        it_hi - it_lo
    )
    one_time = results[f"lowres@{it_lo}"] - it_lo * per_iter
    decode = results[f"full@{it_hi}"] - results[f"lowres@{it_hi}"]
    cost_only = results["matching+cost"] - results["matching"]
    breakdown = {}
    if "matching+build" in results:
        breakdown = {
            "cost_build_ms": round(
                (results["matching+build"] - results["matching"]) * 1000, 2
            ),
            "cost_agg_ms": round(
                (results["matching+agg"] - results["matching+build"]) * 1000, 2
            ),
            "cost_reg_pyr_ms": round(
                (results["matching+cost"] - results["matching+agg"]) * 1000, 2
            ),
        }
    summary = {
        "config": f"IGEV eval {h}x{w} iters={it_hi} maxdisp={cfg.max_disp}"
        + (f" overrides={overrides}" if overrides else ""),
        "per_iter_ms": round(per_iter * 1000, 3),
        "one_time_ms": round(one_time * 1000, 2),
        "decode_ms": round(decode * 1000, 2),
        "matching_ms": round(results["matching"] * 1000, 2),
        "cost_stage_ms": round(cost_only * 1000, 2),
        "context_ms": round(results["context"] * 1000, 2),
        "full_ms": round(results[f"full@{it_hi}"] * 1000, 2),
        "pairs_per_sec": round(1.0 / results[f"full@{it_hi}"], 3),
        **breakdown,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
