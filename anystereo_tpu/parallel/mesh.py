"""Device mesh + sharding helpers.

This is the TPU-native replacement for the reference's device story
(SURVEY.md §2.9): nn.DataParallel scatter/gather and the vestigial NCCL
process-group become a jax.sharding.Mesh with axes

  * data    — batch sharding for training (gradients reduced by the psum
              XLA inserts under jit, the DDP-allreduce analog);
  * spatial — H-tiling of images/cost volumes for high-resolution inference
              with halo exchange (the reference's "long axis", §5).

Multi-host bring-up is `jax.distributed.initialize()` + the same global
mesh; nothing else changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anystereo_tpu.config import MeshConfig


def maybe_initialize_distributed(require: bool = False) -> bool:
    """Multi-host bring-up: call jax.distributed.initialize() when a cluster
    environment is detected (TPU pod metadata, or explicit
    COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars — jax's standard
    cluster autodetection).  Replaces the reference's dormant NCCL
    init_distributed_mode (metrics_utils/misc.py:20-41).

    Safe to call when already initialized (no-op).  Returns True if the
    runtime is (now) multi-process.  With require=True an initialization
    failure raises instead of falling back to single-process."""
    import os

    # do NOT touch jax.process_count()/jax.devices() before initialize():
    # they initialize the XLA backend, after which distributed bring-up
    # is impossible (jax raises)
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    explicit = "COORDINATOR_ADDRESS" in os.environ
    if not (require or explicit):
        return False
    kwargs = {}
    if explicit:
        # explicit bring-up contract: COORDINATOR_ADDRESS (+ NUM_PROCESSES
        # and PROCESS_ID for backends without built-in cluster detection,
        # e.g. multi-process CPU simulation; TPU pods derive both)
        kwargs["coordinator_address"] = os.environ["COORDINATOR_ADDRESS"]
        if "NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        if "PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if require:
            raise
        return False
    return jax.process_count() > 1


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = cfg.data if cfg.data > 0 else n // max(cfg.spatial, 1)
    spatial = cfg.spatial
    if data * spatial != n:
        if spatial > 1:
            # an explicitly requested spatial tiling that cannot be
            # honored must not silently become an unsharded axis — the
            # caller believes high-res inference is tiled and OOMs instead
            raise ValueError(
                f"mesh {data}x{spatial} (data x spatial) does not match "
                f"{n} devices; pick data*spatial == device count"
            )
        # default: all devices on the data axis
        data, spatial = n, 1
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, (cfg.data_axis, cfg.spatial_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, cfg: Optional[MeshConfig] = None) -> NamedSharding:
    axis = (cfg or MeshConfig()).data_axis
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, cfg: Optional[MeshConfig] = None):
    """Place every leaf of a host batch with its leading (batch) axis split
    over the data axis."""
    sh = batch_sharding(mesh, cfg)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
