"""Attribute the context encoder's one-time cost (9.8 ms at the bench
shape, ~4% MXU vs its ~75 GMAC floor): time MultiBasicEncoder under each
norm_2d choice, plus the full-res stem/stage-1 slice alone, to separate
conv cost from normalization cost.

Usage: python tools/profile_context.py [--h 384 --w 1248] [--k 16]
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
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.config import NormType
    from anystereo_tpu.nn.extractor import MultiBasicEncoder
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.h, args.w, 3).astype(np.float32) * 2 - 1)

    results = {}
    for norm in (NormType.GROUP, NormType.FROZEN_BATCH, NormType.INSTANCE,
                 NormType.NONE):
        enc = MultiBasicEncoder(norm=norm, dtype=jnp.bfloat16)
        variables = jax.jit(lambda k, xx: enc.init(k, xx))(
            jax.random.PRNGKey(0), x
        )

        def f(c, v, xx):
            outs = enc.apply(v, xx + c)
            return sum(jnp.sum(a.astype(jnp.float32) * 1e-9) + jnp.sum(
                b.astype(jnp.float32) * 1e-9) for a, b in outs)

        per, aux = pipelined_per_call(f, (variables, x), k=args.k)
        results[norm.name] = per * 1e3
        print(f"context encoder norm={norm.name:12s} {per * 1e3:7.3f} ms "
              f"(compile {aux['compile_s']:.1f}s)", flush=True)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    sys.exit(main())
