"""Multi-device tests on the virtual 8-CPU mesh: sharded train step
(data x spatial), gradient equivalence vs single device, and the driver's
dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from anystereo_tpu.config import MeshConfig
from anystereo_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestMesh:
    def test_make_mesh_shapes(self, cpu_devices):
        mesh = make_mesh(MeshConfig(data=4, spatial=2))
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "spatial")

    def test_make_mesh_mismatched_spatial_raises(self, cpu_devices):
        # an explicitly requested spatial tiling that cannot be honored
        # must error, not silently become an unsharded axis
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=0, spatial=3))  # 3 ∤ 8

    def test_shard_batch_places_leading_axis(self, cpu_devices):
        mesh = make_mesh(MeshConfig(data=8, spatial=1))
        batch = {"x": jnp.zeros((8, 4)), "y": jnp.zeros((8,))}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.spec == P("data")


class TestDryrun:
    def test_dryrun_multichip_8(self, cpu_devices, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip OK" in out

    def test_sharded_loss_matches_single_device(self, cpu_devices):
        """Data-parallel loss on a 2-device mesh must equal the single-chip
        loss on the same batch (the psum/DataParallel equivalence)."""
        from anystereo_tpu.config import ModelConfig, TrainConfig
        from anystereo_tpu.nn.model import AnyStereo
        from anystereo_tpu.train.optimizer import make_optimizer
        from anystereo_tpu.train.state import create_train_state
        from anystereo_tpu.train.step import make_train_step

        cfg = ModelConfig(max_disp=32)
        tcfg = TrainConfig(train_iters=1, batch_size=2)
        model = AnyStereo(cfg)
        b, h, w, q = 2, 32, 64, 64
        rng = np.random.RandomState(0)
        batch = {
            "left": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
            "right": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
            "coords": jnp.asarray(
                (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99
            ),
            "gt": jnp.asarray(rng.rand(b, q).astype(np.float32) * 20),
            "valid": jnp.ones((b, q), np.float32),
            "scale": jnp.ones((b,), np.float32),
            "gt_low": jnp.zeros((b, h // 4, w // 4), np.float32),
        }
        variables = model.init(
            jax.random.PRNGKey(0), batch["left"], batch["right"], iters=1,
            coords=batch["coords"],
        )
        tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.num_steps)
        state0 = create_train_state(variables["params"], tx)

        step1 = make_train_step(model, tcfg)
        s1 = jax.tree_util.tree_map(jnp.copy, state0)
        _, m1 = step1(s1, batch)

        mesh = make_mesh(MeshConfig(data=2, spatial=1), jax.devices()[:2])
        sbatch = shard_batch(batch, mesh)
        s2 = jax.device_put(jax.tree_util.tree_map(jnp.copy, state0), replicated(mesh))
        step2 = make_train_step(model, tcfg, mesh=mesh)
        _, m2 = step2(s2, sbatch)
        # bf16 compute: cross-shard reduction order shifts the loss at ~1e-3
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=2e-3
        )
