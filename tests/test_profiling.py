"""Profiling-utility tests: param counting, compiler FLOPs, roofline math."""

import numpy as np

import jax
import jax.numpy as jnp

from anystereo_tpu.utils.profiling import (
    KernelSpec,
    count_params,
    flops_estimate,
    roofline,
)


def test_count_params():
    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert count_params(tree) == 17


def test_flops_estimate_matmul():
    a = jnp.zeros((64, 64))
    got = flops_estimate(lambda x: x @ x, a)
    if got is not None:  # backend-dependent availability
        assert got >= 2 * 64**3 * 0.5  # within 2x of the analytic count


def test_pipelined_per_call_smoke():
    """The shared K-vs-1 differencing harness (used by bench.py and
    tools/profile_stages.py): runs, returns a sane per-call time and the
    compile/t1/tk aux fields, and rejects k < 2."""
    import pytest

    from anystereo_tpu.utils.profiling import pipelined_per_call

    x = jnp.ones((256, 256))

    def apply_fn(c, a):
        return (a + c) @ a

    per, aux = pipelined_per_call(apply_fn, (x,), k=3, reps=1)
    assert np.isfinite(per)
    assert aux["t1"] > 0 and aux["tk"] > 0 and aux["compile_s"] > 0
    with pytest.raises(ValueError):
        pipelined_per_call(apply_fn, (x,), k=1)


def test_roofline_fractions():
    spec = KernelSpec("k", flops=1e9, bytes_accessed=1e8, unit="vpu_f32_flops")
    r = roofline(spec, measured_s=1e-3)
    assert abs(r["gflops"] - 1000) < 1e-6
    assert 0 < r["compute_frac"] < 1
    assert abs(r["gbytes_per_s"] - 100) < 1e-6
