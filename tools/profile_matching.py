"""A/B the matching-stage schedule knobs (batch_lr_matching etc.) without
paying the full profile_stages compile set.

Usage: python tools/profile_matching.py [--h 384 --w 1248] [--k 8]
       [--overrides '{"batch_lr_matching": false}']
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
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--overrides", default=None,
                    help="JSON ModelConfig overrides; default A/Bs "
                         "batch_lr_matching on/off")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, args.h, args.w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(1, args.h, args.w, 3).astype(np.float32) * 255)

    if args.overrides is not None:
        variants = [("override", json.loads(args.overrides))]
    else:
        variants = [
            ("batched", {"batch_lr_matching": True}),
            ("unbatched", {"batch_lr_matching": False}),
        ]

    results = {}
    for name, ov in variants:
        cfg = ModelConfig(**ov)
        model = AnyStereo(cfg)
        variables = None

        def m_matching(mdl, l, r):
            ln = mdl._normalize(l)
            rn = mdl._normalize(r)
            match_l, match_r, feats_l, stems = mdl._matching(ln, rn)
            outs = [match_l, match_r] + [s for s in stems if s is not None]
            return outs

        variables = jax.jit(
            lambda k, l, r: model.init(k, l, r, method=m_matching)
        )(jax.random.PRNGKey(0), left, right)

        def f(c, v, l, r):
            outs = model.apply(v, l + c, r, method=m_matching)
            return sum(
                jnp.sum(o.astype(jnp.float32)) * 1e-9 for o in outs
            )

        per, aux = pipelined_per_call(f, (variables, left, right), k=args.k)
        results[name] = round(per * 1e3, 3)
        print(f"matching [{name:10s}] {per * 1e3:7.3f} ms "
              f"(compile {aux['compile_s']:.1f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
