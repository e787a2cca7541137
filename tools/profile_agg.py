"""Per-op attribution of the 3-D aggregation stage (CostAggregation):
time every conv/norm/gate of the corr_stem + hourglass standalone at the
bench shape, with MXU/HBM floors, to locate the thin-channel losses.

Usage: python tools/profile_agg.py [--k 16] [--widen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BF16_PEAK = 197e12  # v5e MXU bf16 FLOP/s
HBM_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--d", type=int, default=48)
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--w", type=int, default=312)
    ap.add_argument("--widen", action="store_true",
                    help="measure with the kd-tap lane widening on")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from flax import linen as nn

    from anystereo_tpu.config import NormType
    from anystereo_tpu.nn.layers import ConvNormAct, set_widen_folds, instance_norm
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()
    set_widen_folds(args.widen)

    D, H, W = args.d, args.h, args.w
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def vol(d, h, w, c):
        return jnp.asarray(rng.rand(1, d, h, w, c).astype(np.float32) * 0.1).astype(dt)

    # (label, module ctor or fn, input shape, GMAC)
    def conv3(co, k=3, s=1, p=1, transpose=False, norm=NormType.INSTANCE):
        return ConvNormAct(co, k, stride=s, padding=p, norm=norm, act="leaky",
                           transpose=transpose, dims=3, dtype=dt)

    def gmac_conv(d, h, w, ci, co, k=3, s=1):
        return (d * h * w) // (s ** 3) * (k ** 3) * ci * co / 1e9

    L0 = (D, H, W)
    L1 = (D // 2, H // 2, W // 2)
    L2 = (D // 4, H // 4, W // 4)
    L3 = (D // 8, H // 8, W // 8)
    cases = [
        ("corr_stem 8->8 @L0", conv3(8), vol(*L0, 8), gmac_conv(*L0, 8, 8)),
        ("down 8->16 s2 @L0", conv3(16, s=2), vol(*L0, 8), gmac_conv(*L0, 8, 16, s=2)),
        ("conv 16->16 @L1", conv3(16), vol(*L1, 16), gmac_conv(*L1, 16, 16)),
        ("down 16->32 s2 @L1", conv3(32, s=2), vol(*L1, 16), gmac_conv(*L1, 16, 32, s=2)),
        ("conv 32->32 @L2", conv3(32), vol(*L2, 32), gmac_conv(*L2, 32, 32)),
        ("down 32->48 s2 @L2", conv3(48, s=2), vol(*L2, 32), gmac_conv(*L2, 32, 48, s=2)),
        ("conv 48->48 @L3", conv3(48), vol(*L3, 48), gmac_conv(*L3, 48, 48)),
        ("deconv 48->32 @L3", conv3(32, k=4, s=2, transpose=True), vol(*L3, 48),
         gmac_conv(*L2, 48, 32, k=4) / 8),
        ("mix 64->32 1x1 @L2", conv3(32, k=1, p=0), vol(*L2, 64),
         gmac_conv(*L2, 64, 32, k=1)),
        ("conv 32->32 @L2 (x2 in model)", conv3(32), vol(*L2, 32), gmac_conv(*L2, 32, 32)),
        ("deconv 32->16 @L2", conv3(16, k=4, s=2, transpose=True), vol(*L2, 32),
         gmac_conv(*L1, 32, 16, k=4) / 8),
        ("mix 32->16 1x1 @L1", conv3(16, k=1, p=0), vol(*L1, 32),
         gmac_conv(*L1, 32, 16, k=1)),
        ("conv 16->16 @L1 (x2 in model)", conv3(16), vol(*L1, 16), gmac_conv(*L1, 16, 16)),
        ("deconv 16->8 @L1 (final, no norm)",
         ConvNormAct(8, 4, stride=2, padding=1, norm=NormType.NONE, act=None,
                     transpose=True, dims=3, dtype=dt),
         vol(*L1, 16), gmac_conv(*L0, 16, 8, k=4) / 8),
    ]

    results = {}
    print(f"{'op':36s} {'ms':>8s} {'GMAC':>7s} {'MXU%':>6s} {'HBMfloor':>9s}")
    for label, mod, x, gmac in cases:
        variables = jax.jit(lambda k, xx, m=mod: m.init(k, xx))(
            jax.random.PRNGKey(0), x
        )

        def f(c, v, xx, m=mod):
            return jnp.sum(m.apply(v, xx + c).astype(jnp.float32) * 1e-9)

        per, aux = pipelined_per_call(f, (variables, x), k=args.k)
        ms = per * 1e3
        mxu = gmac * 2e9 / BF16_PEAK / per * 100
        hbm_ms = (x.size + x.size) * 2 / HBM_BW * 1e3  # rough in+out bf16
        results[label] = round(ms, 4)
        print(f"{label:36s} {ms:8.3f} {gmac:7.2f} {mxu:6.1f} {hbm_ms:9.3f}",
              flush=True)

    # instance norm standalone at the two big levels
    for label, x in (("instance_norm @L0 8ch", vol(*L0, 8)),
                     ("instance_norm @L1 16ch", vol(*L1, 16))):
        def fn(c, xx):
            return jnp.sum(instance_norm(xx + c).astype(jnp.float32) * 1e-9)

        per, aux = pipelined_per_call(fn, (x,), k=args.k)
        results[label] = round(per * 1e3, 4)
        print(f"{label:36s} {per * 1e3:8.3f}", flush=True)

    print(json.dumps({"widen": args.widen, **results}))


if __name__ == "__main__":
    sys.exit(main())
