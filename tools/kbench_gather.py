"""On-chip A/B of the implicit-sampling query gather (ROADMAP: north-star
kernel #3): jnp row gather vs the Pallas MXU one-hot-tile kernel
(ops/pallas/gather_kernel.py), at the production LIIF training shapes —
per GRU iteration the decoder gathers Q = inp_h·inp_w queries from the
stem_2x table (N = inp_h/2·inp_w/2, C≈32) and the cat(stem_4x, hidden)
table (N = inp_h/4·inp_w/4, C≈176), plus the 9-tap disparity rows.

Measures forward and forward+backward (the training path), pipelined
K-vs-1 differencing with chained-output validation.

Usage: python tools/kbench_gather.py [--inp-h 160 --inp-w 320] [--k 32]
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
    ap.add_argument("--inp-h", type=int, default=160)
    ap.add_argument("--inp-w", type=int, default=320)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.ops.pallas.gather_kernel import (
        gather_rows,
        gather_rows_hybrid,
    )
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    b = args.batch
    q = args.inp_h * args.inp_w
    tables = {
        "stem2x_c32": ((args.inp_h // 2) * (args.inp_w // 2), 32),
        "latent_c176": ((args.inp_h // 4) * (args.inp_w // 4), 176),
        "disp_taps_c9": ((args.inp_h // 4) * (args.inp_w // 4), 9),
    }

    def impl_jnp(tbl, idx):
        return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(tbl, idx)

    def impl_pallas(tbl, idx):
        return gather_rows(tbl, idx, interpret)

    def impl_hybrid(tbl, idx):
        return gather_rows_hybrid(tbl, idx, interpret)

    rng = np.random.RandomState(0)
    results = {}
    for name, (n, c) in tables.items():
        tbl = jnp.asarray(rng.randn(b, n, c).astype(np.float32)).astype(
            args.dtype
        )
        idx = jnp.asarray(rng.randint(0, n, size=(b, q)).astype(np.int32))
        print(f"-- {name}: table [{b},{n},{c}] {args.dtype}, Q={q}")
        row = {}
        ref_out = None
        for iname, fn in (
            ("jnp", impl_jnp),
            ("pallas", impl_pallas),
            ("hybrid", impl_hybrid),
        ):
            # forward: perturb the TABLE by the carry so the chain cannot
            # be hoisted; validate the first (carry=0) output
            per, aux = pipelined_per_call(
                lambda cc, t, i, _fn=fn: _fn(t + cc.astype(t.dtype), i),
                (tbl, idx), k=args.k,
            )
            direct = np.asarray(fn(tbl, idx), np.float32)
            got = np.asarray(aux["first_out"], np.float32).reshape(direct.shape)
            np.testing.assert_allclose(got, direct, rtol=1e-2, atol=1e-2)
            if ref_out is None:
                ref_out = direct
            else:
                np.testing.assert_allclose(
                    direct, ref_out, rtol=1e-2, atol=1e-2,
                    err_msg=f"{name}: pallas forward != jnp forward",
                )
            row[f"{iname}_fwd_ms"] = per * 1e3

            # forward+backward (training): grad wrt table of a scalar loss
            def fb(cc, t, i, _fn=fn):
                def loss(tt):
                    o = _fn(tt, i).astype(jnp.float32)
                    return jnp.sum(o * o)

                return jax.grad(loss)(t + cc.astype(t.dtype))

            per_b, aux_b = pipelined_per_call(fb, (tbl, idx), k=args.k)
            row[f"{iname}_fwdbwd_ms"] = per_b * 1e3
            print(
                f"   {iname:7s} fwd {row[f'{iname}_fwd_ms']:7.3f} ms   "
                f"fwd+bwd {row[f'{iname}_fwdbwd_ms']:7.3f} ms  "
                f"(compile {aux['compile_s']:.1f}/{aux_b['compile_s']:.1f}s)"
            )
        for iname in ("pallas", "hybrid"):
            row[f"{iname}_fwdbwd_speedup"] = row["jnp_fwdbwd_ms"] / max(
                row[f"{iname}_fwdbwd_ms"], 1e-9
            )
        print(
            f"   fwd+bwd speedup vs jnp: pallas "
            f"{row['pallas_fwdbwd_speedup']:.2f}x, hybrid "
            f"{row['hybrid_fwdbwd_speedup']:.2f}x"
        )
        results[name] = row

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
