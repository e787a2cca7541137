"""Pallas lookup-kernel parity tests (interpret mode on CPU) against the
pure-jnp oracle gather_1d_linear, including the custom-VJP backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.ops.pallas.lookup_kernel import (
    gather_rows_linear,
    pallas_available,
)
from anystereo_tpu.ops.sampling import gather_1d_linear

pytestmark = pytest.mark.skipif(not pallas_available(), reason="no pallas")


class TestForwardParity:
    @pytest.mark.parametrize("r,l,k", [(10, 48, 9), (300, 312, 9), (7, 24, 5)])
    def test_matches_jnp_oracle(self, rng, r, l, k):
        vol = jnp.asarray(rng.randn(r, l).astype(np.float32))
        pos = jnp.asarray((rng.rand(r, k).astype(np.float32) * (l + 8)) - 4)
        want = gather_1d_linear(vol, pos)
        got = gather_rows_linear(vol, pos, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                                   atol=1e-5)

    def test_out_of_bounds_zero(self):
        vol = jnp.ones((4, 16))
        pos = jnp.asarray([[-3.0, 20.0]] * 4)
        got = gather_rows_linear(vol, pos, True)
        np.testing.assert_allclose(np.asarray(got), 0.0)

    def test_integer_positions_exact(self, rng):
        vol = jnp.asarray(rng.randn(5, 32).astype(np.float32))
        pos = jnp.asarray(rng.randint(0, 32, (5, 4)).astype(np.float32))
        got = np.asarray(gather_rows_linear(vol, pos, True))
        want = np.take_along_axis(np.asarray(vol), np.asarray(pos, np.int64), 1)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestBackwardParity:
    def test_vjp_matches_jnp_oracle(self, rng):
        r, l, k = 12, 40, 9
        vol = jnp.asarray(rng.randn(r, l).astype(np.float32))
        pos = jnp.asarray(rng.rand(r, k).astype(np.float32) * (l - 1))
        g = jnp.asarray(rng.randn(r, k).astype(np.float32))

        # oracle gradient wrt vol with stopped positions
        def oracle(v):
            return (gather_1d_linear(v, pos) * g).sum()

        want = jax.grad(oracle)(vol)

        def kernel_loss(v):
            return (gather_rows_linear(v, pos, True) * g).sum()

        got = jax.grad(kernel_loss)(vol)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                                   atol=1e-5)

    def test_positions_get_no_gradient(self, rng):
        vol = jnp.asarray(rng.randn(3, 16).astype(np.float32))
        pos = jnp.asarray(rng.rand(3, 5).astype(np.float32) * 15)

        def loss(p):
            return gather_rows_linear(vol, p, True).sum()

        dpos = jax.grad(loss)(pos)
        np.testing.assert_allclose(np.asarray(dpos), 0.0)
