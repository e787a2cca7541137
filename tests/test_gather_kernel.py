"""Parity tests for the MXU one-hot-tile query gather
(ops/pallas/gather_kernel.py — the implicit-sampling kernel): forward and
scatter-add backward vs the jnp row-gather oracle, in interpret mode on
CPU (the on-TPU path compiles the identical kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.ops.pallas.gather_kernel import (
    gather_rows,
    gather_rows_hybrid,
)
from anystereo_tpu.ops.sampling import (
    gather_rows_flat,
    nearest_sample,
    set_gather_override,
)


def _oracle(table, idx):
    return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(table, idx)


def _rand(rng, b, n, c, q, dtype=np.float32):
    table = jnp.asarray(rng.randn(b, n, c).astype(dtype))
    # duplicates on purpose: q > n in some cases, and repeated draws
    idx = jnp.asarray(rng.randint(0, n, size=(b, q)).astype(np.int32))
    return table, idx


class TestGatherRows:
    @pytest.mark.parametrize(
        "b,n,c,q",
        [
            (1, 64, 8, 32),      # tiny, everything padded
            (2, 513, 33, 257),   # non-multiples of NK/QT on every axis
            (1, 1024, 176, 600), # production-like channel width
        ],
    )
    def test_forward_matches_oracle_fp32(self, rng, b, n, c, q):
        table, idx = _rand(rng, b, n, c, q)
        out = gather_rows(table, idx, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_oracle(table, idx)),
            rtol=1e-6, atol=1e-6,
        )

    def test_forward_exact_bf16(self, rng):
        table, idx = _rand(rng, 2, 300, 48, 500)
        table = table.astype(jnp.bfloat16)
        out = gather_rows(table, idx, True)
        assert out.dtype == jnp.bfloat16
        # selection, not arithmetic: bf16 rows must come through EXACT
        np.testing.assert_array_equal(
            np.asarray(out, np.float32),
            np.asarray(_oracle(table, idx), np.float32),
        )

    def test_backward_scatter_add_with_duplicates(self, rng):
        # q >> n so nearly every row is hit many times — the transpose
        # must SUM duplicate contributions (the CUDA sampler's += loop,
        # sampler_kernel.cu:102, as MXU accumulation)
        table, idx = _rand(rng, 2, 40, 12, 640)
        cot = jnp.asarray(rng.randn(2, 640, 12).astype(np.float32))

        def f_kernel(t):
            return jnp.vdot(gather_rows(t, idx, True), cot)

        def f_oracle(t):
            return jnp.vdot(_oracle(t, idx), cot)

        g_k = jax.grad(f_kernel)(table)
        g_o = jax.grad(f_oracle)(table)
        np.testing.assert_allclose(
            np.asarray(g_k), np.asarray(g_o), rtol=1e-5, atol=1e-5
        )

    def test_backward_bf16_table(self, rng):
        table, idx = _rand(rng, 1, 64, 16, 128)
        table = table.astype(jnp.bfloat16)
        cot = jnp.asarray(rng.randn(1, 128, 16).astype(np.float32))
        g_k = jax.grad(
            lambda t: jnp.vdot(
                gather_rows(t, idx, True).astype(jnp.float32), cot
            )
        )(table)
        g_o = jax.grad(
            lambda t: jnp.vdot(_oracle(t, idx).astype(jnp.float32), cot)
        )(table)
        assert g_k.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g_k, np.float32), np.asarray(g_o, np.float32),
            rtol=2e-2, atol=2e-2,  # bf16 cotangent rounding
        )

    def test_hybrid_forward_and_backward(self, rng):
        """gather_rows_hybrid: XLA forward must equal the oracle exactly;
        the Pallas backward must equal the oracle VJP (duplicates summed)."""
        table, idx = _rand(rng, 2, 50, 24, 300)
        np.testing.assert_array_equal(
            np.asarray(gather_rows_hybrid(table, idx, True)),
            np.asarray(_oracle(table, idx)),
        )
        cot = jnp.asarray(rng.randn(2, 300, 24).astype(np.float32))
        g_h = jax.grad(
            lambda t: jnp.vdot(gather_rows_hybrid(t, idx, True), cot)
        )(table)
        g_o = jax.grad(lambda t: jnp.vdot(_oracle(t, idx), cot))(table)
        np.testing.assert_allclose(
            np.asarray(g_h), np.asarray(g_o), rtol=1e-5, atol=1e-5
        )

    def test_nearest_sample_dispatch_parity(self, rng):
        """nearest_sample through the pallas impl (interpret) must equal
        the jnp impl bit-for-bit in fp32."""
        feat = jnp.asarray(rng.randn(2, 12, 17, 9).astype(np.float32))
        coords = jnp.asarray(
            (rng.rand(2, 83, 2).astype(np.float32) * 2 - 1) * 0.98
        )
        ref = nearest_sample(feat, coords)
        set_gather_override("pallas", interpret=True)
        try:
            out = nearest_sample(feat, coords)
        finally:
            set_gather_override(None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_gather_rows_flat_env_override(self, rng, monkeypatch):
        table, idx = _rand(rng, 1, 32, 4, 16)
        monkeypatch.setenv("ANYSTEREO_GATHER_IMPL", "jnp")
        out = gather_rows_flat(table, idx)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(_oracle(table, idx))
        )

    def test_sharded_batch_and_query(self, cpu_devices):
        """Under a (data x spatial) mesh with table sharded on batch and
        idx sharded on (batch, query), the custom_partitioning rule must
        keep the result correct (table replicated across query shards)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(
            np.asarray(cpu_devices[:4]).reshape(2, 2), ("data", "spatial")
        )
        rng = np.random.RandomState(3)
        table = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 64, size=(2, 32)).astype(np.int32))
        ref = _oracle(table, idx)
        table_s = jax.device_put(
            table, NamedSharding(mesh, P("data", None, None))
        )
        idx_s = jax.device_put(idx, NamedSharding(mesh, P("data", "spatial")))
        out = jax.jit(lambda t, i: gather_rows(t, i, True))(table_s, idx_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
