"""Spatially-tiled high-resolution inference (BASELINE config #4).

Runs the full eval pipeline with images H-sharded over the `spatial` mesh
axis — the TPU analog of context parallelism for this model family
(SURVEY.md §5: the reference's "long axis" is the W^2 all-pairs correlation
and the GWC volume; it only ever downscales to avoid the problem).  GSPMD
partitions the convolutions (inserting halo exchanges for the ±4-px lookup
and ~32-px hourglass receptive fields, SURVEY §7 halo math) and the Pallas
lookup kernel partitions over pixel columns via its custom_partitioning
rule (ops/pallas/lookup_kernel.py).

Reports the per-device memory footprint of the sharded program vs the
unsharded single-device program (AOT compile, no execution needed), and
with --execute also runs both and checks numerical agreement.

Usage (virtual mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/tiled_infer.py --height 1504 --width 2016 --devices 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TiB"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1504)
    p.add_argument("--width", type=int, default=2016)
    p.add_argument("--devices", type=int, default=0, help="0 = all")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--max-disp", type=int, default=192)
    p.add_argument("--execute", action="store_true",
                   help="run both programs and compare outputs (slow on CPU); "
                   "forces fp32 compute so the comparison is an exactness "
                   "check — under bf16 the softargmax over max_disp/4 bins "
                   "amplifies benign reduction-order noise to ~0.2 px")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.nn.model import AnyStereo

    n = args.devices or len(jax.devices())
    devices = np.asarray(jax.devices()[:n]).reshape(1, n)
    mesh = Mesh(devices, ("data", "spatial"))
    h, w = args.height, args.width
    assert h % (4 * n) == 0, f"height must divide 4*devices={4*n}"

    cfg = ModelConfig(
        max_disp=args.max_disp,
        **({"compute_dtype": "float32"} if args.execute else {}),
    )
    model = AnyStereo(cfg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255)

    variables = jax.jit(lambda k, l, r: model.init(k, l, r, iters=1, mode="eval"))(
        jax.random.PRNGKey(0), left, right
    )

    def fwd(v, l, r):
        return model.apply(v, l, r, iters=args.iters, mode="eval").disp_final

    img_sh = NamedSharding(mesh, P(None, "spatial"))
    repl = NamedSharding(mesh, P())

    tiled = jax.jit(
        fwd,
        in_shardings=(repl, img_sh, img_sh),
        out_shardings=img_sh,
    )
    single = jax.jit(fwd)

    print(f"compiling tiled program ({n}-way H-sharding) ...", flush=True)
    tiled_c = tiled.lower(variables, left, right).compile()
    print("compiling single-device program ...", flush=True)
    single_c = single.lower(variables, left, right).compile()

    mt = tiled_c.memory_analysis()
    ms = single_c.memory_analysis()

    def report(name, m):
        if m is None:
            print(f"{name}: memory analysis unavailable on this backend")
            return None
        tot = (
            m.temp_size_in_bytes
            + m.argument_size_in_bytes
            + m.output_size_in_bytes
        )
        print(
            f"{name}: temp {human(m.temp_size_in_bytes)}, args "
            f"{human(m.argument_size_in_bytes)}, out "
            f"{human(m.output_size_in_bytes)}  => total {human(tot)}"
        )
        return tot

    t_tot = report(f"tiled (per-device, {n} devices)", mt)
    s_tot = report("single-device", ms)
    if t_tot and s_tot:
        print(f"per-shard footprint = {t_tot / s_tot:.2f}x of unsharded "
              f"(ideal {1/n:.3f}x + halo/replicated-param overhead)")

    if args.execute:
        print("executing tiled ...", flush=True)
        out_t = np.asarray(
            tiled(variables, jax.device_put(left, img_sh), jax.device_put(right, img_sh))
        )
        print("executing single ...", flush=True)
        out_s = np.asarray(single(variables, left, right))
        err = np.abs(out_t - out_s).max()
        print(f"max |tiled - single| = {err:.2e} (fp32 compute)")
        assert err < 1e-2, "tiled inference diverges from single-device"
        print("outputs agree")


if __name__ == "__main__":
    main()
