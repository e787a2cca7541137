"""Benchmark harness — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": "stereo_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": R, ...aux fields...}

Protocol: flagship continuous-IGEV model, eval mode (32 GRU iterations,
the reference's valid_iters, train_continuous_IGEV.py:302), KITTI-class
input 384x1248, batch 1, full-resolution LIIF decode — the reference's
per-image inference timing bracket (evaluation.py:234-236) made precise
with block_until_ready.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
documented stand-in is the IGEV-Stereo paper's 0.37 s/frame at KITTI
resolution on an RTX 3090 → 2.7 pairs/s.  vs_baseline = value / 2.7.

vs_baseline_a100: the north star says "≥3x frames/s/chip vs A100".  No
A100 timing of this model exists anywhere (the reference publishes none),
so the anchor is DERIVED from the 3090 number.  Spec ratios A100-SXM vs
RTX 3090: HBM bandwidth 1.56-2.04 TB/s vs 0.94 TB/s (1.7-2.2x); tensor
peak with fp32 accumulate (the AMP default) 312 vs 71 TFLOP/s (4.4x).
Real conv-heavy AMP workloads sit near the bandwidth ratio, not the
tensor ratio — public ResNet/detection training+inference benchmarks
measure A100 at 1.5-2x a 3090 end-to-end.  We take the end of that range
LEAST favorable to us — 2.0x — giving an A100-equivalent baseline of
2.7 x 2.0 = 5.4 pairs/s; the honest north-star bar (3x) is therefore
16.2 pairs/s.  Both ratios are reported so the margin is auditable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.7  # IGEV-Stereo paper, KITTI res, RTX 3090
# A100-equivalent anchor: 3090 number x 2.0 (worst-case 3090->A100 scaling
# for conv-heavy AMP stereo workloads; derivation in the module docstring
# and BASELINE.md)
A100_BASELINE_PAIRS_PER_SEC = 5.4


def _check_device_reachable(timeout_s: float = 180.0):
    """Fail fast (rc 3) if the TPU is unreachable: a dead axon tunnel
    otherwise hangs the first dispatch forever, which reads as a driver
    timeout instead of an infrastructure error."""
    import threading

    ok = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        jax.jit(lambda a: a * 2)(jnp.ones(4)).block_until_ready()
        np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(2)))
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(
            f"bench: TPU unreachable (device probe did not complete in "
            f"{timeout_s:.0f}s — axon tunnel down?)",
            file=sys.stderr,
        )
        raise SystemExit(3)


def main():
    _check_device_reachable()

    import jax
    import jax.numpy as jnp

    from anystereo_tpu.config import ModelConfig
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    b, h, w = 1, 384, 1248
    iters = 32
    # A/B knob: ANYSTEREO_BENCH_OVERRIDES='{"fuse_gru_gates": true}' applies
    # simple (bool/int/float/str) ModelConfig field overrides — the default
    # benchmark protocol is the plain reference config.
    overrides = json.loads(os.environ.get("ANYSTEREO_BENCH_OVERRIDES", "{}"))
    cfg = ModelConfig(**overrides)  # max_disp 192, the reference default
    model = AnyStereo(cfg)

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)

    t0 = time.time()
    variables = jax.jit(
        lambda k, l, r: model.init(k, l, r, iters=1, mode="eval")
    )(jax.random.PRNGKey(0), left, right)
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    # eval decodes the full-res grid via the gather-free dense path
    fwd = jax.jit(
        lambda v, l, r: model.apply(
            v, l, r, iters=iters, mode="eval"
        ).disp_final
    )
    t0 = time.time()
    out = np.asarray(fwd(variables, left, right))
    compile_s = time.time() - t0
    assert np.isfinite(out).all()

    # End-to-end single-pair latency including the host round-trip.
    # NOTE: timing forces a host transfer per call — jax.block_until_ready
    # does NOT reliably block on the axon platform (measured returning in
    # 0.4 ms for a 5.7 s computation).  On this dev tunnel the transfer of
    # the [384,1248] fp32 output costs ~70 ms + ~33 ms RTT, which a
    # host-attached production deployment does not pay (PCIe moves 1.9 MB
    # in ~0.1 ms) — hence the separate pipelined measurement below.
    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        out = np.asarray(fwd(variables, left, right))
    per_pair_e2e = (time.time() - t0) / n_rep

    # Pipelined device throughput: K sequential pairs in one program,
    # timed by K-vs-1 scan differencing so both the tunnel RTT and the
    # output transfer cancel (shared harness: utils/profiling).  This is
    # the steady-state pairs/s a pipelined serving loop sustains.
    from anystereo_tpu.utils.profiling import pipelined_per_call

    per_pair_dev, aux = pipelined_per_call(
        lambda c, v, l, r: model.apply(
            v, l + c, r + c, iters=iters, mode="eval"
        ).disp_final,
        (variables, left, right),
        k=6,
        reps=2,
    )
    pairs_per_sec = b / per_pair_dev

    # The chained scan's first iteration (carry = 0) must reproduce the
    # direct forward — otherwise the steady-state path could regress
    # numerically while still posting a finite-looking throughput.
    chained_out = np.asarray(aux["first_out"]).reshape(out.shape)
    assert np.allclose(chained_out, out, rtol=1e-2, atol=0.05), (
        "pipelined-chain output diverges from the direct forward: "
        f"max |diff| = {np.abs(chained_out - out).max()}"
    )

    print(
        json.dumps(
            {
                "metric": "stereo_pairs_per_sec",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "vs_baseline_a100": round(
                    pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3
                ),
                "config": f"IGEV eval {h}x{w} iters={iters} maxdisp={cfg.max_disp} bf16, pipelined"
                + (f" overrides={overrides}" if overrides else ""),
                "latency_ms": round(per_pair_dev * 1000, 1),
                "latency_ms_e2e_tunnel": round(per_pair_e2e * 1000, 1),
                "compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


def _main_with_retry(attempts: int = 3):
    """The axon dev tunnel drops connections transiently (observed:
    'remote_compile: read body: response body closed' mid-run, which cost
    round 3 its bench artifact).  Retry the whole measurement on runtime
    errors — compiles hit the persistent cache on the second pass."""
    for i in range(attempts):
        try:
            return main()
        except SystemExit:
            raise
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            if i == attempts - 1:
                raise
            print(
                f"bench: attempt {i + 1} failed ({type(e).__name__}: {e}); "
                "retrying in 30 s",
                file=sys.stderr,
            )
            time.sleep(30)


if __name__ == "__main__":
    _main_with_retry()
