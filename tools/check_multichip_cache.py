"""Gate: the committed multichip compilation cache (.jax_cache_multichip)
must be WARM for current HEAD.

The driver validates multi-chip sharding by running __graft_entry__.py's
dryrun_multichip on an 8-virtual-CPU mesh; a cold cache there costs a
400+ s GSPMD compile with a slow-compile alarm (MULTICHIP_r04 paid exactly
that because the committed cache predated the final model change).  This
tool runs the dryrun under the driver's environment while counting
persistent-compilation-cache hits vs misses (jax.monitoring events,
jax/_src/compiler.py) and FAILS if any executable had to be compiled,
printing the regeneration recipe.

Usage:
  python tools/check_multichip_cache.py          # gate: fail on any miss
  python tools/check_multichip_cache.py --regen  # populate the cache
                                                 # (misses expected), then
                                                 # re-run without --regen

Run as the LAST act before a round ends, after any model/train-step change:
  python tools/check_multichip_cache.py --regen && \
  python tools/check_multichip_cache.py && git add .jax_cache_multichip
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def _reexec_with_env():
    """jax reads platform env at import; set it before anything imports jax."""
    if all(os.environ.get(k) == v for k, v in _ENV.items()):
        return
    env = dict(os.environ)
    env.update(_ENV)
    env["ANYSTEREO_CACHE_CHECK_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--regen", action="store_true",
        help="populate the cache instead of gating (misses allowed)",
    )
    ap.add_argument("--n-devices", type=int, default=8)
    args = ap.parse_args()

    _reexec_with_env()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax  # noqa: E402  (env is set now)

    # the axon site hook force-sets JAX_PLATFORMS=axon and IGNORES the env
    # override — the config API is honored (same workaround as
    # tests/conftest.py); XLA_FLAGS device_count is still read from env
    jax.config.update("jax_platforms", "cpu")
    from jax import monitoring

    counts = {"requests": 0, "hits": 0}

    def _listener(event: str, **kw) -> None:
        if event == "/jax/compilation_cache/compile_requests_use_cache":
            counts["requests"] += 1
        elif event == "/jax/compilation_cache/cache_hits":
            counts["hits"] += 1

    monitoring.register_event_listener(_listener)

    import __graft_entry__

    t0 = time.time()
    __graft_entry__.dryrun_multichip(args.n_devices)
    dt = time.time() - t0

    misses = counts["requests"] - counts["hits"]
    print(
        f"[cache-check] compile requests: {counts['requests']}, "
        f"cache hits: {counts['hits']}, misses: {misses}, "
        f"end-to-end {dt:.1f}s"
    )
    if args.regen:
        print(
            "[cache-check] regen run complete — now verify with:\n"
            "  python tools/check_multichip_cache.py\n"
            "and commit the cache:  git add .jax_cache_multichip"
        )
        return 0
    # Gate criterion: programs under jax_persistent_cache_min_compile_time
    # (1 s) are never persisted, so they always count as misses — an
    # all-hits assert would never pass.  What actually hurt the driver was
    # the 400+ s cold GSPMD jit_step compile (MULTICHIP_r04); warm via the
    # committed cache the whole dryrun measures ~260 s on this host.  So:
    # the big programs must HIT (hits >= 1) and the end-to-end time must
    # stay far below the cold ~870 s.
    budget_s = 420.0
    if counts["hits"] < 1 or dt > budget_s:
        print(
            "[cache-check] FAIL: the committed .jax_cache_multichip looks "
            f"STALE for current HEAD (hits={counts['hits']}, end-to-end "
            f"{dt:.0f}s > budget {budget_s:.0f}s means the big GSPMD "
            "programs compiled cold).  The driver's dryrun would pay a "
            "slow cold compile.  Regenerate:\n"
            "  python tools/check_multichip_cache.py --regen && \\\n"
            "  python tools/check_multichip_cache.py && "
            "git add .jax_cache_multichip && git commit",
            file=sys.stderr,
        )
        return 1
    print(f"[cache-check] OK: multichip cache warm for current HEAD "
          f"({counts['hits']} big-program hits, {dt:.0f}s end-to-end)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
