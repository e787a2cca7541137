"""Aligned-lookup kernel variant microbench (ROADMAP #6).

Attributes the per-iteration lookup cost (profile_iter: ~0.85 ms at the
bench shape) between the kernel's three stages — barrel roll, tap
extraction, output transpose — plus the Pallas/streaming floor, separately
for the two production calls (GEV: deep-lane shallow-row; corr: shallow-lane
deep-row), then reports fraction-of-VPU-peak for the full kernels.

Variants (timing-only; values are wrong for anything but "full").  All
floor/ablation variants write ROW-major ([levels*taps, tile]) so the
output-transpose cost appears exactly once, in full - notranspose:
  copy        stream vol through the kernel, write 18 rows   -> floor
  rolls       barrel roll, write 18 aligned rows             -> floor+roll
  extract     tap extraction on the unrolled volume          -> floor+extract
  notranspose full kernel, row-major output                  -> full - transpose
  full        the production kernel (pixel-major output)

The "full" variant and the pyramid_lookup e2e measurement validate the
pipelined chain's first output against a direct apply (the
pipelined_per_call contract) and abort on mismatch.

Usage:  python tools/kbench_lookup.py [--h 384 --w 1248] [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=1248)
    ap.add_argument("--maxdisp", type=int, default=192)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--taps", type=int, default=9)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from anystereo_tpu.ops.pallas import lookup_kernel as lk
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache
    from anystereo_tpu.utils.profiling import pipelined_per_call

    enable_compilation_cache()

    taps, levels = args.taps, args.levels
    radius = (taps - 1) // 2
    h4, w4 = args.h // 4, args.w // 4
    d = args.maxdisp // 4

    def variant_fwd(vol_t, x, variant):
        """_pyr_a_pm_pallas_fwd with a stage-ablation variant."""
        length, r = vol_t.shape
        lpad = lk._align_lpad(length, taps, levels, radius)
        tile = lk._pix_tile(lpad)
        rpad = lk._round_up(max(r, 128), tile)
        vol_p = jnp.pad(
            vol_t.astype(jnp.float32), ((0, lpad - length), (0, rpad - r))
        )
        x_p = jnp.pad(
            x.astype(jnp.float32).reshape(1, -1), ((0, 0), (0, rpad - r))
        )
        pixel_major = variant == "full"
        kern = functools.partial(
            lk._pyr_align_fwd_kernel, length=length, taps=taps,
            levels=levels, radius=radius, variant=variant,
            pixel_major=pixel_major,
        )
        if not pixel_major:
            out = pl.pallas_call(
                kern,
                grid=(rpad // tile,),
                in_specs=[
                    pl.BlockSpec((lpad, tile), lambda i: (0, i)),
                    pl.BlockSpec((1, tile), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((levels * taps, tile), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct(
                    (levels * taps, rpad), jnp.float32
                ),
            )(vol_p, x_p)
            return out[:, :r]
        out = pl.pallas_call(
            kern,
            grid=(rpad // tile,),
            in_specs=[
                pl.BlockSpec((lpad, tile), lambda i: (0, i)),
                pl.BlockSpec((1, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((tile, levels * taps), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rpad, levels * taps), jnp.float32),
        )(vol_p, x_p)
        return out[:r]

    rng = np.random.RandomState(0)
    calls = {
        # production geo call: [D, B*H4*W4*G], positions = disp per group
        "geo": (
            jnp.asarray(rng.rand(d, h4 * w4 * args.groups).astype(np.float32)),
            jnp.asarray(
                (rng.rand(h4 * w4 * args.groups) * d).astype(np.float32)
            ),
        ),
        # production corr call: [W4, B*H4*W4], positions = coords - disp
        "corr": (
            jnp.asarray(rng.rand(w4, h4 * w4).astype(np.float32)),
            jnp.asarray((rng.rand(h4 * w4) * w4).astype(np.float32)),
        ),
    }

    results = {}
    for name, (vol_t, x) in calls.items():
        lpad = lk._align_lpad(vol_t.shape[0], taps, levels, radius)
        tile = lk._pix_tile(lpad)
        rpad = lk._round_up(max(x.shape[0], 128), tile)
        print(f"-- {name}: vol_t {vol_t.shape} lpad={lpad} tile={tile} "
              f"rpad={rpad} bits={(lpad - 1).bit_length()}")
        row = {}
        for variant in ("copy", "rolls", "extract", "notranspose", "full"):
            per, aux = pipelined_per_call(
                lambda c, v, xx, _var=variant: variant_fwd(v, xx + c, _var),
                (vol_t, x), k=args.k,
            )
            if variant == "full":
                # pipelined_per_call contract: validate the chained path's
                # first output against a direct apply so the posted number
                # can't come from a garbage-computing chain
                direct = variant_fwd(vol_t, x, "full")
                np.testing.assert_allclose(
                    np.asarray(aux["first_out"]), np.asarray(direct),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"{name}: chained 'full' output != direct apply",
                )
            row[variant] = per * 1e3
            print(f"   {variant:12s} {per * 1e3:7.3f} ms  "
                  f"(t1 {aux['t1'] * 1e3:.1f}, compile {aux['compile_s']:.1f}s)")
        results[name] = row

    # production full-path reference: both calls + the jnp reshapes around them
    from anystereo_tpu.ops.lookup import build_pyramid, pyramid_lookup

    geo0 = jnp.asarray(
        rng.rand(1, h4, w4, args.groups, d).astype(np.float32))
    corr0 = jnp.asarray(rng.rand(1, h4, w4, w4).astype(np.float32))
    disp = jnp.asarray((rng.rand(1, h4, w4) * d).astype(np.float32))
    pyr = build_pyramid(corr0, geo0, num_levels=levels, radius=radius)
    per, aux = pipelined_per_call(
        lambda c, dd: pyramid_lookup(pyr, dd + c, impl="pallas"),
        (disp,), k=args.k,
    )
    direct = pyramid_lookup(pyr, disp, impl="pallas")
    for got, want in zip(
        jax.tree_util.tree_leaves(aux["first_out"]),
        jax.tree_util.tree_leaves(direct),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg="pyramid_lookup e2e: chained output != direct apply",
        )
    results["pyramid_lookup_e2e"] = per * 1e3
    print(f"-- pyramid_lookup (both calls + reshapes): {per * 1e3:.3f} ms")

    # VPU roofline: elementwise-op count model of the full kernels
    # (roll+select per bit over the active block, extraction reshape-sums,
    # output transpose), vs ~4 fp32 lanespaces/cycle @ 0.94 GHz ≈ 3.9 Tops/s.
    vpu_peak = 8 * 128 * 4 * 0.94e9  # fp32 elementwise ops/s, v5e
    for name, (vol_t, x) in calls.items():
        lpad = lk._align_lpad(vol_t.shape[0], taps, levels, radius)
        _, _, window = lk._aligned_geometry(taps, levels, radius)
        total_bits = (lpad - 1).bit_length()
        fine_bits = min(5, total_bits)
        fine_rows = min(lpad, lk._round_up(window + (1 << fine_bits) - 1, 8))
        p = x.shape[0]
        coarse = max(0, total_bits - fine_bits) * lpad * 2  # roll+select
        fine = fine_bits * fine_rows * 2
        extract = sum(
            (taps + 1) * (3 + 2 * (1 << lvl)) if lvl else (taps + 1) * 3
            for lvl in range(levels)
        )
        ops = (coarse + fine + extract + levels * taps) * p
        t = results[name]["full"] * 1e-3
        results[name]["vpu_frac"] = ops / vpu_peak / t
        print(f"-- {name}: modeled {ops / 1e6:.0f}M VPU ops, "
              f"{ops / vpu_peak * 1e3:.3f} ms at peak -> "
              f"{results[name]['vpu_frac'] * 100:.0f}% of VPU peak")

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
