"""Per-component timing of the GRU update block at the bench shape.

profile_iter.py gives lookup-vs-update totals; this tool breaks the update
block itself into its convolutions (gru04 z/r gates, gru04 q, gru08,
gru16, motion encoder, disp head, pool/interp glue) so optimization
targets the real hot spot instead of the aggregate.  Components are timed
standalone with the shared K-vs-1 differencing harness
(utils/profiling.pipelined_per_call, measurement rules in docs/PERF.md),
each with a carry perturbation folded into its input so XLA cannot hoist
the body out of the scan.

  PYTHONPATH=. python tools/profile_update_convs.py [--reps 8]
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
    ap.add_argument("--reps", type=int, default=8,
                    help="scan length per timed call (amortizes overhead)")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()

    overrides = json.loads(os.environ.get("ANYSTEREO_BENCH_OVERRIDES", "{}"))
    cfg = ModelConfig(**overrides)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h4, w4 = args.h // 4, args.w // 4
    h8, w8 = args.h // 8, args.w // 8
    h16, w16 = args.h // 16, args.w // 16
    hid = cfg.hidden_dims[0]
    lookup_ch = cfg.lookup_channels
    rng = np.random.RandomState(0)

    def t(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dt)

    def conv_timer(label, x_shape, kern, out_ch, reps=args.reps, extra=None):
        """Time `reps` chained conv applications (+ optional elementwise)."""
        x0 = t(x_shape)
        k = t(kern + (x_shape[-1], out_ch))
        pad = tuple((s // 2, s // 2) for s in kern)

        def f(c, x0, k):
            def body(carry, _):
                y = jax.lax.conv_general_dilated(
                    x0 + carry.astype(dt) * 1e-9, k, (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                if extra is not None:
                    y = extra(y)
                return jnp.sum(y.astype(jnp.float32)) * 1e-20 + carry, None

            out, _ = jax.lax.scan(body, c, None, length=reps)
            return out

        per, _ = pipelined_per_call(f, (x0, k), k=args.k)
        ms = per / reps * 1000
        gmac = (np.prod(x_shape[:3]) * np.prod(kern) * x_shape[-1] * out_ch
                / 1e9)
        # v5e bf16 MXU peak ~197 TFLOP/s = 197 GFLOP/ms → floor in ms
        floor = gmac * 2 / 197.0
        eff = floor / ms if ms > 0 else float("nan")
        print(f"{label:28s} {ms:7.3f} ms  {gmac:6.1f} GMAC  "
              f"floor {floor:6.3f} ms  MXU {eff * 100:5.1f}%", flush=True)
        return {"ms": round(ms, 4), "gmac": round(float(gmac), 2),
                "mxu_pct": round(eff * 100, 1)}

    res = {}
    # gru04: hx = [h(128) | motion(128) | up(128)] = 384 ch
    res["gru04_zr_fused"] = conv_timer(
        "gru04 z+r fused (384->256)", (1, h4, w4, 3 * hid), (3, 3), 2 * hid)
    res["gru04_z_single"] = conv_timer(
        "gru04 single gate (384->128)", (1, h4, w4, 3 * hid), (3, 3), hid)
    res["gru04_q"] = conv_timer(
        "gru04 q (384->128)", (1, h4, w4, 3 * hid), (3, 3), hid)
    # gru08 sees [h | pool2x(net0) | up(net2)] = 384; gru16 [h | pool] = 256
    res["gru08_zr_fused"] = conv_timer(
        "gru08 z+r fused (384->256)", (1, h8, w8, 3 * hid), (3, 3), 2 * hid)
    res["gru08_q"] = conv_timer(
        "gru08 q (384->128)", (1, h8, w8, 3 * hid), (3, 3), hid)
    res["gru16_zr_fused"] = conv_timer(
        "gru16 z+r fused (256->256)", (1, h16, w16, 2 * hid), (3, 3), 2 * hid)
    res["gru16_q"] = conv_timer(
        "gru16 q (256->128)", (1, h16, w16, 2 * hid), (3, 3), hid)
    # motion encoder
    res["me_convc1"] = conv_timer(
        f"me convc1 1x1 ({lookup_ch}->64)", (1, h4, w4, lookup_ch), (1, 1), 64)
    res["me_convc2"] = conv_timer(
        "me convc2 3x3 (64->64)", (1, h4, w4, 64), (3, 3), 64)
    res["me_convd1"] = conv_timer(
        "me convd1 7x7 (1->64)", (1, h4, w4, 1), (7, 7), 64)
    res["me_convd2"] = conv_timer(
        "me convd2 3x3 (64->64)", (1, h4, w4, 64), (3, 3), 64)
    res["me_conv"] = conv_timer(
        "me conv 3x3 (128->127)", (1, h4, w4, 128), (3, 3), 127)
    # disp head
    res["dh_conv1"] = conv_timer(
        "disp_head conv1 (128->256)", (1, h4, w4, hid), (3, 3), 256)
    res["dh_conv2"] = conv_timer(
        "disp_head conv2 (256->1)", (1, h4, w4, 256), (3, 3), 1)

    total = sum(v["ms"] for v in res.values()) - res["gru04_z_single"]["ms"]
    print(f"\nsum of parts (fused-zr wiring): {total:.3f} ms "
          f"(update_block slope from profile_iter gives the true total "
          f"incl. pools/interps/concats/elementwise)")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
