"""Scaling-efficiency harness (BASELINE.json metric: pairs/sec/chip at
1 chip / 1 host / N hosts).

Runs the full training step on data-parallel meshes of increasing size and
reports samples/sec/device and scaling efficiency vs 1 device.  On real
multi-chip hardware run as-is (jax.distributed.initialize for multi-host);
on a single-chip dev box use --cpu to exercise the collective path on
virtual devices (numbers then validate the mechanism, not the speed).

  python tools/scaling_bench.py [--cpu] [--devices 1 2 4 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU platform")
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from anystereo_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from anystereo_tpu.train.optimizer import make_optimizer
    from anystereo_tpu.train.state import create_train_state
    from anystereo_tpu.train.step import make_train_step

    n_avail = jax.device_count()
    sizes = args.devices or [n for n in (1, 2, 4, 8) if n <= n_avail]
    cfg = ModelConfig(max_disp=64)
    h, w, q = 64, 128, 2048
    rng = np.random.RandomState(0)

    def batch_for(b):
        return {
            "left": rng.rand(b, h, w, 3).astype(np.float32) * 255,
            "right": rng.rand(b, h, w, 3).astype(np.float32) * 255,
            "coords": (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99,
            "gt": rng.rand(b, q).astype(np.float32) * 20,
            "valid": np.ones((b, q), np.float32),
            "scale": np.ones((b,), np.float32),
            "gt_low": rng.rand(b, h // 4, w // 4).astype(np.float32) * 5,
        }

    model = AnyStereo(cfg)
    tcfg = TrainConfig(train_iters=args.iters, batch_size=1, supervise_init=True)
    base_rate = None
    print(f"platform {jax.default_backend()}  devices {n_avail}")
    for n in sizes:
        b = n  # one sample per device
        batch = batch_for(b)
        variables = jax.jit(
            lambda k, bt: model.init(
                k, bt["left"], bt["right"], iters=1, coords=bt["coords"],
                scale=bt["scale"],
            )
        )(jax.random.PRNGKey(0), jax.device_put(batch))
        tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.num_steps)
        state = create_train_state(variables["params"], tx)
        mesh = None
        if n > 1:
            mesh = make_mesh(MeshConfig(data=n, spatial=1), jax.devices()[:n])
            state = jax.device_put(state, replicated(mesh))
            batch = shard_batch(batch, mesh)
        step = make_train_step(model, tcfg, mesh=mesh)
        state, m = step(state, batch)  # compile
        float(m["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            state, m = step(state, batch)
            float(m["loss"])  # host sync
        dt = (time.time() - t0) / args.steps
        rate = b / dt
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(
            f"devices {n}: {dt * 1000:8.1f} ms/step  {rate:7.2f} samples/s  "
            f"{per_dev:7.2f}/device  efficiency {eff * 100:5.1f}%"
        )


if __name__ == "__main__":
    main()
