"""Split the per-GRU-iteration cost between the Pallas pyramid lookup and
the ConvGRU update block.

profile_stages.py gives the combined slope (per-iter ms); this tool scans
each half alone — with a tiny data dependence threaded through the carry so
XLA cannot hoist the body — and reports slopes separately, using the same
two-point iteration differencing (docs/PERF.md measurement rules).

Usage:  python tools/profile_iter.py [--h 384 --w 1248]
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
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--only", choices=["lookup", "update", "both"], default="both")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.ops.lookup import pyramid_lookup
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()

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

    # fixed stage inputs, computed once outside the timed region
    def stage_inputs(mdl, l, r):
        ln, rn = mdl._normalize(l), mdl._normalize(r)
        match_l, match_r, feats_l, stems = mdl._matching(ln, rn)
        pyr, init_disp = mdl._cost_stage(match_l, match_r, feats_l)
        net, ctx = mdl._context(ln)
        return pyr, init_disp, net, ctx

    pyr, init_disp, net0, ctx = jax.jit(
        lambda v, l, r: model.apply(v, l, r, method=stage_inputs)
    )(variables, left, right)
    geo0 = pyramid_lookup(pyr, init_disp)
    jax.block_until_ready((pyr, init_disp, net0, ctx, geo0))

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def lookup_only(iters):
        def f(c, v, disp):
            def body(carry, _):
                d = carry
                geo = pyramid_lookup(pyr, d)
                # thread a dependence through the carry so the body can't hoist
                return d + geo[..., 0] * 1e-9, None

            out, _ = jax.lax.scan(body, disp + c, None, length=iters)
            return out

        return f

    def lookup_split(iters):
        """The production handoff (split_lookup_concat): split parts,
        compute-dtype out — no concat, no cast."""

        def f(c, v, disp):
            def body(carry, _):
                d = carry
                parts = pyramid_lookup(pyr, d, split=True, out_dtype=dt)
                return (
                    d + parts[0][..., 0].astype(jnp.float32) * 1e-9,
                    None,
                )

            out, _ = jax.lax.scan(body, disp + c, None, length=iters)
            return out

        return f

    def update_only(iters):
        def f(c, v, disp):
            def body(mdl, carry, _):
                net, d = carry
                geo = (geo0 + d[..., None] * 1e-9).astype(dt)
                net, delta = mdl.update_block(
                    net,
                    ctx,
                    corr=geo,
                    disp=d[..., None].astype(dt),
                    iter16=cfg.n_gru_layers == 3,
                    iter08=cfg.n_gru_layers >= 2,
                )
                return (net, d + delta[..., 0].astype(jnp.float32)), None

            from flax import linen as nn

            scanned = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=iters,
            )

            def run(mdl, d):
                (net, d2), _ = scanned(mdl, (net0, d), None)
                return d2

            return model.apply(v, disp + c, method=run)

        return f

    def slope(make, label):
        per_lo, _ = pipelined_per_call(make(args.lo), (variables, init_disp), k=args.k)
        per_hi, _ = pipelined_per_call(make(args.hi), (variables, init_disp), k=args.k)
        s = (per_hi - per_lo) / (args.hi - args.lo)
        print(f"{label:24s} {s * 1000:7.3f} ms/iter", flush=True)
        return s

    res = {}
    tile = os.environ.get("ANYSTEREO_LOOKUP_TILE")
    if tile:
        res["lookup_tile"] = int(tile)
    if args.only in ("lookup", "both"):
        res["lookup_ms_per_iter"] = round(
            slope(lookup_only, "pyramid_lookup") * 1000, 3
        )
        res["lookup_split_ms_per_iter"] = round(
            slope(lookup_split, "pyramid_lookup(split)") * 1000, 3
        )
    if args.only in ("update", "both"):
        res["update_ms_per_iter"] = round(
            slope(update_only, "update_block") * 1000, 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
