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


class TestWindowKernel:
    def test_matches_generic_kernel(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import gather_window_linear

        r, l, k = 50, 48, 9
        vol = jnp.asarray(rng.randn(r, l).astype(np.float32))
        base = jnp.asarray(rng.rand(r).astype(np.float32) * (l + 6) - 3)
        pos = base[:, None] + jnp.arange(k, dtype=jnp.float32)
        want = gather_1d_linear(vol, pos)
        got = gather_window_linear(vol, base, k, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                                   atol=1e-5)

    def test_window_vjp_matches_oracle(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import gather_window_linear

        r, l, k = 12, 32, 9
        vol = jnp.asarray(rng.randn(r, l).astype(np.float32))
        base = jnp.asarray(rng.rand(r).astype(np.float32) * (l - k))
        g = jnp.asarray(rng.randn(r, k).astype(np.float32))
        pos = base[:, None] + jnp.arange(k, dtype=jnp.float32)

        want = jax.grad(lambda v: (gather_1d_linear(v, pos) * g).sum())(vol)
        got = jax.grad(
            lambda v: (gather_window_linear(v, base, k, True) * g).sum()
        )(vol)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                                   atol=1e-5)

    def test_pyramid_lookup_pallas_impl_matches_jnp(self, rng, monkeypatch):
        """End-to-end pyramid lookup parity between impls (interpret mode),
        pinned to the classify kernel flavor (the aligned flavor has its own
        end-to-end test in TestAlignedPyramidKernel)."""
        from anystereo_tpu.ops.cost_volume import all_pairs_correlation
        from anystereo_tpu.ops.lookup import build_pyramid, pyramid_lookup
        import anystereo_tpu.ops.lookup as lookup_mod

        monkeypatch.setenv("ANYSTEREO_LOOKUP_KERNEL", "classify")
        b, h, w, c, g, d = 1, 4, 16, 8, 2, 8
        fl = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        geo = jnp.asarray(rng.randn(b, h, w, g, d).astype(np.float32))
        disp = jnp.asarray(rng.rand(b, h, w).astype(np.float32) * (d - 1))
        corr = all_pairs_correlation(fl, fr)
        pyr = build_pyramid(corr, geo, 2, 2)
        want = pyramid_lookup(pyr, disp, impl="jnp")
        # force the fused pallas path in interpret mode
        import anystereo_tpu.ops.pallas.lookup_kernel as kmod

        orig = kmod.gather_pyramid_window_pm
        kmod.gather_pyramid_window_pm = (
            lambda vol, bases, taps, interp=False: orig(vol, bases, taps, True)
        )
        try:
            got = pyramid_lookup(pyr, disp, impl="pallas")
        finally:
            kmod.gather_pyramid_window_pm = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                                   atol=1e-4)


class TestPyramidFusedKernel:
    def test_matches_pooled_levels(self, rng):
        """The in-kernel lane-shift pooling must equal explicit avg-pool +
        per-level window gather, including odd-length truncation."""
        from anystereo_tpu.ops.pallas.lookup_kernel import gather_pyramid_window
        from anystereo_tpu.ops.sampling import pool_half_last

        r_, l, k, levels = 30, 45, 9, 3  # odd length exercises truncation
        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        bases = jnp.asarray(rng.rand(r_, levels).astype(np.float32) * 10 - 2)
        got = np.asarray(gather_pyramid_window(vol, bases, k, True))
        lv = vol
        for i in range(levels):
            pos = np.asarray(bases)[:, i : i + 1] + np.arange(k)
            want = np.asarray(gather_1d_linear(lv, jnp.asarray(pos)))
            np.testing.assert_allclose(
                got[:, i * k : (i + 1) * k], want, rtol=1e-4, atol=1e-5,
                err_msg=f"level {i}",
            )
            lv = pool_half_last(lv)

    def test_fused_vjp_matches_oracle(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import gather_pyramid_window
        from anystereo_tpu.ops.sampling import pool_half_last

        r_, l, k, levels = 8, 24, 5, 2
        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        bases = jnp.asarray(rng.rand(r_, levels).astype(np.float32) * 6)
        g = jnp.asarray(rng.randn(r_, levels * k).astype(np.float32))

        def oracle(v):
            lv, tot = v, 0.0
            for i in range(levels):
                pos = bases[:, i : i + 1] + jnp.arange(k, dtype=jnp.float32)
                tot = tot + (
                    gather_1d_linear(lv, pos) * g[:, i * k : (i + 1) * k]
                ).sum()
                lv = pool_half_last(lv)
            return tot

        want = jax.grad(oracle)(vol)
        got = jax.grad(
            lambda v: (gather_pyramid_window(v, bases, k, True) * g).sum()
        )(vol)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                                   atol=1e-5)


class TestTransposedPyramidKernel:
    """gather_pyramid_window_t: the pixels-on-lanes formulation must agree
    exactly with gather_pyramid_window (which is itself oracle-tested)."""

    @pytest.mark.parametrize("r_,l", [(300, 48), (64, 45), (40, 312)])
    def test_fwd_matches_row_kernel(self, rng, r_, l):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window,
            gather_pyramid_window_t,
        )

        levels, k = 2, 9
        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        bases = jnp.asarray(
            (rng.rand(r_, levels) * (l + 10) - 8).astype(np.float32)
        )
        want = gather_pyramid_window(vol, bases, k, True)
        got = gather_pyramid_window_t(vol.T, bases.T, k, True).T
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_vjp_matches_row_kernel(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window,
            gather_pyramid_window_t,
        )

        r_, l, levels, k = 50, 48, 2, 9
        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        bases = jnp.asarray((rng.rand(r_, levels) * 30 - 4).astype(np.float32))
        g = jnp.asarray(rng.randn(r_, levels * k).astype(np.float32))
        want = jax.grad(
            lambda v: (gather_pyramid_window(v, bases, k, True) * g).sum()
        )(vol)
        got = jax.grad(
            lambda v: (gather_pyramid_window_t(v, bases.T, k, True) * g.T).sum()
        )(vol.T).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestPixelMajorPyramidKernel:
    """gather_pyramid_window_pm: in-kernel output transpose must agree
    exactly with gather_pyramid_window_t (itself oracle-tested), forward
    and backward, and partition over the pixel axis under GSPMD."""

    @pytest.mark.parametrize("r_,l", [(300, 48), (64, 45), (40, 312)])
    def test_fwd_matches_transposed_kernel(self, rng, r_, l):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window_pm,
            gather_pyramid_window_t,
        )

        levels, k = 2, 9
        vol_t = jnp.asarray(rng.randn(l, r_).astype(np.float32))
        bases_t = jnp.asarray(
            (rng.rand(levels, r_) * (l + 10) - 8).astype(np.float32)
        )
        want = gather_pyramid_window_t(vol_t, bases_t, k, True).T
        got = gather_pyramid_window_pm(vol_t, bases_t, k, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_vjp_matches_transposed_kernel(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window_pm,
            gather_pyramid_window_t,
        )

        r_, l, levels, k = 50, 48, 2, 9
        vol_t = jnp.asarray(rng.randn(l, r_).astype(np.float32))
        bases_t = jnp.asarray((rng.rand(levels, r_) * 30 - 4).astype(np.float32))
        g = jnp.asarray(rng.randn(r_, levels * k).astype(np.float32))
        want = jax.grad(
            lambda v: (gather_pyramid_window_t(v, bases_t, k, True) * g.T).sum()
        )(vol_t)
        got = jax.grad(
            lambda v: (gather_pyramid_window_pm(v, bases_t, k, True) * g).sum()
        )(vol_t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_partitions_without_allgather(self, rng):
        import re

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window_pm,
            gather_pyramid_window_t,
        )

        devices = np.array(jax.devices()[:8])
        if devices.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devices.reshape(8), ("spatial",))
        r_, l, levels, k = 8 * 64, 48, 2, 9
        vol_np = rng.rand(l, r_).astype(np.float32)
        bases_np = (rng.rand(levels, r_) * 40 - 4).astype(np.float32)
        sh = NamedSharding(mesh, P(None, "spatial"))
        vol_t = jax.device_put(jnp.asarray(vol_np), sh)
        bases_t = jax.device_put(jnp.asarray(bases_np), sh)

        f = jax.jit(lambda v, b: gather_pyramid_window_pm(v, b, k, True))
        hlo = f.lower(vol_t, bases_t).compile().as_text()
        assert not re.search(r"all-gather", hlo), "kernel inputs were gathered"
        out = f(vol_t, bases_t)
        assert out.sharding.spec == P("spatial",) or out.sharding.spec == P(
            "spatial", None
        )
        ref = gather_pyramid_window_t(
            jnp.asarray(vol_np), jnp.asarray(bases_np), k, True
        ).T
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestShardedKernel:
    """custom_partitioning: the transposed kernel must partition over the
    pixel axis under GSPMD — no all-gathers, sharded output, exact values
    (round-1 gap: the kernel path had never executed under sharding)."""

    def test_partitions_without_allgather(self, rng):
        import re

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window,
            gather_pyramid_window_t,
        )

        devices = np.array(jax.devices()[:8])
        if devices.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devices.reshape(8), ("spatial",))
        r_, l, levels, k = 8 * 64, 48, 2, 9
        vol_np = rng.rand(l, r_).astype(np.float32)
        bases_np = (rng.rand(levels, r_) * 40 - 4).astype(np.float32)
        sh = NamedSharding(mesh, P(None, "spatial"))
        vol_t = jax.device_put(jnp.asarray(vol_np), sh)
        bases_t = jax.device_put(jnp.asarray(bases_np), sh)

        f = jax.jit(lambda v, b: gather_pyramid_window_t(v, b, k, True))
        hlo = f.lower(vol_t, bases_t).compile().as_text()
        assert not re.search(r"all-gather", hlo), "kernel inputs were gathered"
        out = f(vol_t, bases_t)
        assert out.sharding.spec == P(None, "spatial")
        ref = gather_pyramid_window(
            jnp.asarray(vol_np.T), jnp.asarray(bases_np.T), k, True
        ).T
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_grad_partitions(self, rng):
        import re

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_window,
            gather_pyramid_window_t,
        )

        devices = np.array(jax.devices()[:8])
        if devices.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devices.reshape(8), ("spatial",))
        r_, l, levels, k = 8 * 32, 24, 2, 5
        vol_np = rng.rand(l, r_).astype(np.float32)
        bases_np = (rng.rand(levels, r_) * 16 - 2).astype(np.float32)
        g_np = rng.rand(levels * k, r_).astype(np.float32)
        sh = NamedSharding(mesh, P(None, "spatial"))
        vol_t = jax.device_put(jnp.asarray(vol_np), sh)
        bases_t = jax.device_put(jnp.asarray(bases_np), sh)
        g_sh = jax.device_put(jnp.asarray(g_np), sh)

        gradf = jax.jit(
            jax.grad(
                lambda v: (gather_pyramid_window_t(v, bases_t, k, True) * g_sh).sum()
            )
        )
        hlo = gradf.lower(vol_t).compile().as_text()
        assert not re.search(r"all-gather", hlo)
        dv = gradf(vol_t)
        dref = jax.grad(
            lambda v: (
                gather_pyramid_window(v, jnp.asarray(bases_np.T), k, True)
                * jnp.asarray(g_np.T)
            ).sum()
        )(jnp.asarray(vol_np.T)).T
        np.testing.assert_allclose(
            np.asarray(dv), np.asarray(dref), rtol=1e-5, atol=1e-5
        )


class TestAlignedPyramidKernel:
    """gather_pyramid_aligned_pm (barrel-shift alignment): parity against
    the explicit pool+window oracle, including odd-length truncation,
    far-out-of-range positions (clamp path), tiny volumes (L < window),
    and the custom-VJP backward."""

    @staticmethod
    def _oracle(vol, x, k, levels):
        from anystereo_tpu.ops.sampling import pool_half_last

        r = (k - 1) // 2
        lv, outs = vol, []
        for i in range(levels):
            base = x[:, None] * (2.0 ** -i) - r
            pos = base + jnp.arange(k, dtype=jnp.float32)
            outs.append(gather_1d_linear(lv, pos))
            lv = pool_half_last(lv)
        return jnp.concatenate(outs, axis=-1)

    @pytest.mark.parametrize(
        "r_,l,k,levels",
        [(40, 48, 9, 2), (64, 45, 9, 2), (16, 24, 5, 3), (8, 9, 9, 2)],
    )
    def test_fwd_matches_oracle(self, rng, r_, l, k, levels):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
        )

        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        # positions spanning in-range, partially-valid and fully-dead lanes
        x = jnp.asarray(
            (rng.rand(r_).astype(np.float32) * (l + 40)) - 20
        )
        want = self._oracle(vol, x, k, levels)
        got = gather_pyramid_aligned_pm(vol.T, x, k, levels, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_far_out_of_range_all_zero(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
        )

        l, k, levels = 48, 9, 2
        vol = jnp.asarray(rng.randn(8, l).astype(np.float32))
        x = jnp.asarray([-1e6, -500.0, 1e6, 500.0, 1e30, -1e30, 97.0, -30.0],
                        jnp.float32)
        got = np.asarray(gather_pyramid_aligned_pm(vol.T, x, k, levels, True))
        want = np.asarray(self._oracle(vol, x, k, levels))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_integer_positions_exact(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
        )

        l, k, levels = 32, 9, 2
        vol = jnp.asarray(rng.randn(12, l).astype(np.float32))
        x = jnp.asarray(rng.randint(0, l, size=12).astype(np.float32))
        got = np.asarray(gather_pyramid_aligned_pm(vol.T, x, k, levels, True))
        want = np.asarray(self._oracle(vol, x, k, levels))
        np.testing.assert_array_equal(got[:, :k], want[:, :k])  # level 0 exact

    def test_vjp_matches_oracle(self, rng):
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
        )

        r_, l, k, levels = 24, 45, 9, 2  # odd length
        vol = jnp.asarray(rng.randn(r_, l).astype(np.float32))
        x = jnp.asarray((rng.rand(r_).astype(np.float32) * (l + 20)) - 10)
        g = jnp.asarray(rng.randn(r_, levels * k).astype(np.float32))

        want = jax.grad(lambda v: (self._oracle(v, x, k, levels) * g).sum())(vol)
        got = jax.grad(
            lambda vt: (gather_pyramid_aligned_pm(vt, x, k, levels, True) * g).sum()
        )(vol.T).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_pyramid_lookup_aligned_matches_jnp(self, rng, monkeypatch):
        """End-to-end: pyramid_lookup with the aligned flavor forced equals
        the jnp fallback (IGEV config: GEV + corr, 2 levels, radius 4)."""
        from anystereo_tpu.ops import lookup as lk

        monkeypatch.setenv("ANYSTEREO_LOOKUP_KERNEL", "aligned")
        b, h, w, g, d = 1, 6, 20, 4, 16
        corr = jnp.asarray(rng.randn(b, h, w, w).astype(np.float32))
        geo = jnp.asarray(rng.randn(b, h, w, g, d).astype(np.float32))
        pyr = lk.build_pyramid(corr, geo, 2, 4)
        disp = jnp.asarray(rng.rand(b, h, w).astype(np.float32) * d)
        want = lk.pyramid_lookup(pyr, disp, impl="jnp")
        lk.set_impl_override("pallas", interpret=True)
        try:
            got = lk.pyramid_lookup(pyr, disp)
        finally:
            lk.set_impl_override(None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_partitions_without_allgather(self, rng):
        import re

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from anystereo_tpu.ops.pallas.lookup_kernel import (
            gather_pyramid_aligned_pm,
        )

        devices = np.array(jax.devices()[:8])
        if devices.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devices.reshape(8), ("spatial",))
        r_, l, levels, k = 8 * 32, 24, 2, 5
        vol_np = rng.rand(l, r_).astype(np.float32)
        x_np = (rng.rand(r_) * 30 - 3).astype(np.float32)
        g_np = rng.rand(r_, levels * k).astype(np.float32)
        vol_t = jax.device_put(jnp.asarray(vol_np),
                               NamedSharding(mesh, P(None, "spatial")))
        x = jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, P("spatial")))
        g_sh = jax.device_put(jnp.asarray(g_np),
                              NamedSharding(mesh, P("spatial", None)))

        f = jax.jit(lambda v, xx: gather_pyramid_aligned_pm(v, xx, k, levels, True))
        hlo = f.lower(vol_t, x).compile().as_text()
        assert not re.search(r"all-gather", hlo)
        out = f(vol_t, x)
        want = TestAlignedPyramidKernel._oracle(
            jnp.asarray(vol_np.T), jnp.asarray(x_np), k, levels
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

        gradf = jax.jit(
            jax.grad(
                lambda v: (gather_pyramid_aligned_pm(v, x, k, levels, True) * g_sh).sum()
            )
        )
        hlo = gradf.lower(vol_t).compile().as_text()
        assert not re.search(r"all-gather", hlo)
        dv = gradf(vol_t)
        dref = jax.grad(
            lambda v: (
                TestAlignedPyramidKernel._oracle(v, jnp.asarray(x_np), k, levels)
                * jnp.asarray(g_np)
            ).sum()
        )(jnp.asarray(vol_np.T)).T
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dref),
                                   rtol=1e-4, atol=1e-5)
