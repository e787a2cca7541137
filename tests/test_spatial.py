"""Spatial-tiling tests on the virtual CPU mesh: halo_exchange correctness
against a replicated oracle, and H-sharded inference matching single-device
inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from anystereo_tpu.parallel.spatial import halo_exchange, infer_spatial_sharded


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestHaloExchange:
    def test_interior_halos_match_neighbors(self, cpu_devices):
        n_dev, h, w = 4, 16, 8
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("s",))
        x = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)

        f = shard_map(
            lambda blk: halo_exchange(blk, halo=2, axis_name="s", axis=0),
            mesh=mesh,
            in_specs=P("s", None),
            out_specs=P("s", None),
        )
        out = np.asarray(f(x))  # [(4+4)*4... each shard 4 rows + 2*2 halo]
        out = out.reshape(n_dev, h // n_dev + 4, w)
        xs = np.asarray(x).reshape(n_dev, h // n_dev, w)
        for i in range(n_dev):
            np.testing.assert_array_equal(out[i, 2:-2], xs[i])
            if i > 0:
                np.testing.assert_array_equal(out[i, :2], xs[i - 1][-2:])
            else:
                np.testing.assert_array_equal(out[i, :2], xs[0][:2])  # edge replicate
            if i < n_dev - 1:
                np.testing.assert_array_equal(out[i, -2:], xs[i + 1][:2])
            else:
                np.testing.assert_array_equal(out[i, -2:], xs[-1][-2:])


class TestSpatialInference:
    def test_sharded_inference_matches_single_device(self, cpu_devices):
        """IGEV eval with H sharded over 2 devices must agree with the
        unsharded result (GSPMD inserts the right halos)."""
        from anystereo_tpu.config import ModelConfig
        from anystereo_tpu.nn.model import AnyStereo, dense_query_coords

        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        b, h, w = 1, 64, 64
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = dense_query_coords(b, h, w)
        scale = jnp.ones((1,), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, coords=coords, scale=scale
        )

        ref = model.apply(
            variables, left, right, iters=2, coords=coords, scale=scale, mode="eval"
        ).disp_final

        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("data", "spatial"))
        got = infer_spatial_sharded(
            model, variables["params"], left, right, coords, scale, mesh, iters=2
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-2, atol=5e-2
        )
        # bulk agreement: bf16 reduction-order noise compounds through the
        # GRU iterations; median stays well under a tenth of a pixel
        diff = np.abs(np.asarray(got) - np.asarray(ref))
        assert np.median(diff) < 0.05
