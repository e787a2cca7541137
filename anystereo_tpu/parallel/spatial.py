"""Spatial (H-axis) tiling of high-resolution inference across chips — the
TPU analog of context parallelism for this model family (SURVEY.md §5: the
reference's "long axis" is the W² all-pairs correlation and the GWC volume;
it only ever avoids the problem by downscale-then-implicit-upsample).

Two mechanisms:

  * `halo_exchange` — explicit neighbor exchange of boundary rows via
    jax.lax.ppermute, for shard_map kernels that tile H and need the conv /
    lookup receptive field (r=4 lookup taps x 2 pyramid levels and the
    ~32 px hourglass field, SURVEY.md §7 halo math);
  * `infer_spatial_sharded` — GSPMD path: inputs placed with H sharded over
    the `spatial` mesh axis; XLA partitions the convolutions and inserts
    the halo exchanges automatically.  The all-pairs correlation stays
    H-parallel (each scanline's correlation row is independent,
    geometry.py:70), so no W-axis collectives are needed.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, axis: int = 1) -> jnp.ndarray:
    """Pad a locally-sharded block with `halo` rows from each neighbor along
    the sharded axis (edge-replicate at the global boundary).

    For use inside shard_map over a 1-D mesh axis: x is the local shard
    [..., H_local, ...]; returns [..., H_local + 2*halo, ...].
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    def take(a, sl):
        slices = [slice(None)] * a.ndim
        slices[axis] = sl
        return a[tuple(slices)]

    top = take(x, slice(0, halo))  # my first rows → send to previous rank
    bot = take(x, slice(x.shape[axis] - halo, x.shape[axis]))

    # receive previous rank's bottom rows and next rank's top rows
    from_prev = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # at the global edges replicate the boundary row itself (F.pad
    # mode='replicate' semantics: the edge row repeated `halo` times) —
    # copying the first/last `halo` rows in forward order would put the
    # wrong row adjacent to the boundary for any halo > 1
    edge_top = jnp.repeat(take(x, slice(0, 1)), halo, axis=axis)
    edge_bot = jnp.repeat(
        take(x, slice(x.shape[axis] - 1, x.shape[axis])), halo, axis=axis
    )
    from_prev = jnp.where(idx == 0, edge_top, from_prev)
    from_next = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def infer_spatial_sharded(
    model,
    params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    coords: jnp.ndarray,
    scale: jnp.ndarray,
    mesh: Mesh,
    iters: int = 32,
    spatial_axis: str = "spatial",
):
    """High-res inference with images/queries H-sharded over the spatial
    mesh axis (GSPMD partitions convs/lookup and inserts halos).

    `params` is a bare params tree or a full variables dict — the latter
    carries batch_stats for the frozen-BN reference regime (converted
    torch checkpoints)."""
    from anystereo_tpu.eval.validate import _as_variables

    img_sh = NamedSharding(mesh, P(None, spatial_axis))
    q_sh = NamedSharding(mesh, P(None, spatial_axis))
    repl = NamedSharding(mesh, P())
    left = jax.device_put(left, img_sh)
    right = jax.device_put(right, img_sh)
    coords = jax.device_put(coords, q_sh)
    scale = jax.device_put(scale, repl)
    variables = jax.device_put(_as_variables(params), repl)

    @partial(jax.jit, out_shardings=q_sh)
    def fn(variables, left, right, coords, scale):
        out = model.apply(
            variables, left, right, iters=iters, coords=coords,
            scale=scale, mode="eval",
        )
        return out.disp_final

    return fn(variables, left, right, coords, scale)
