"""MXU row-gather kernel — the implicit-sampling (LIIF query) fast path.

The arbitrary-scale decoder samples, per query, the latent vector of the
cell the query lands in (liif_feat_multiscale_train, liif.py:108-137 —
grid_sample(mode='nearest')).  At training shapes that is a random row
gather of Q≈51k rows per latent per GRU iteration: out[b, q] =
table[b, idx[b, q]].  XLA lowers it to a serial dynamic-gather loop on
TPU; the dense eval decode avoids it with SEPARABLE one-hot matmuls
(ops/sampling.nearest_dense_gather), but training queries are scattered,
so the one-hot matrix [Q, N] is non-separable and would cost Q*N bytes of
HBM if materialized (≈330 MB at training shapes) — which is exactly why
XLA cannot take that route, and why this is a kernel.

TPU-native design (this file): the latent tables are SMALL (N = h/4·w/4 ≈
3.2k-12.8k rows — they fit VMEM whole), the query set is big.  So:

  * keep the whole [N, C] table VMEM-resident across the grid;
  * for each tile of QT queries, build one-hot tiles [QT, NK] ON THE FLY
    in VMEM (iota-vs-index compare — never touches HBM) and contract
    them against table chunks on the MXU:  out_tile = Σ_k 1h_k @ tbl_k.
  * backward is the transposed contraction accumulated into the
    VMEM-resident [N, C] gradient block: dtbl_k += 1h_kᵀ @ g_tile —
    scatter-add (duplicate indices included) as pure MXU accumulation,
    replacing the CUDA sampler's atomic-free scatter loop
    (sampler_kernel.cu:63-105) with matmuls.

Selection-as-matmul is EXACT for bf16 tables (the one-hot weights are
exact 1.0/0.0, each output row receives exactly one table row); fp32
tables use precision=HIGHEST (≤1 ulp from the 3-term bf16 split).

Gather indices carry no gradient (nearest sampling is piecewise
constant in the coords — the reference's grid_sample(mode='nearest')
likewise returns no coord gradient), so the custom VJP returns a
cotangent only for the table.

GSPMD: the op partitions over the batch axis, and the forward also over
the query axis (each query tile needs the whole table, so the table is
replicated across query shards — sharding_rule "b n c, b q -> b q c").
The backward contracts over q, so it partitions over batch only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Tile sizes (on-chip sweep 2026-08-20, tools/kbench_gather.py): the MAC
# count Q·N·C is fixed by the one-hot formulation, so efficiency is set by
# the M-tile height — QT=128 ran the [QT,NK]x[NK,C] dots at ~15% MXU;
# QT=512 quadruples the M tile.  NK bounds the VMEM onehot tile
# ([QT, NK] — 1 MB at 512x1024 bf16).
_QT = 512  # queries per grid step (sublane-axis rows of the one-hot tile)
_NK = 1024  # table rows per contraction chunk (lane axis of the one-hot)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dot_precision(dtype) -> jax.lax.Precision:
    # bf16 tables: single-pass MXU is already exact (one-hot weights);
    # fp32 tables need the 3-term split to reconstruct the mantissa
    return (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _gather_fwd_kernel(tbl_ref, idx_ref, out_ref, *, n: int, nk: int):
    """out[q, c] = tbl[idx[q], c] for one [QT] query tile.

    tbl_ref: [1, Npad, C]; idx_ref: [1, 1, QT] (f32 row indices);
    out_ref: [1, QT, C].
    """
    qt = out_ref.shape[1]
    c = out_ref.shape[2]
    dtype = tbl_ref.dtype
    # f32 in VMEM (lane-friendly transport), int32 for the iota compare
    idx_col = jnp.swapaxes(idx_ref[0], 0, 1).astype(jnp.int32)  # [QT, 1]
    nchunks = _round_up(n, nk) // nk

    def body(k, acc):
        tbl_k = tbl_ref[0, pl.ds(k * nk, nk), :]  # [NK, C]
        iota = jax.lax.broadcasted_iota(jnp.int32, (qt, nk), 1)
        onehot = (iota == (idx_col - k * nk)).astype(dtype)
        return acc + jax.lax.dot_general(
            onehot,
            tbl_k,
            (((1,), (0,)), ((), ())),
            precision=_dot_precision(dtype),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((qt, c), jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _gather_bwd_kernel(idx_ref, g_ref, dtbl_ref, *, n: int, nk: int):
    """dtbl[p, c] += Σ_q [idx[q] == p] · g[q, c], accumulated across the
    query-tile grid (the output block has a constant index map, so it
    stays VMEM-resident; q revisits are consecutive).

    idx_ref: [1, 1, QT]; g_ref: [1, QT, C]; dtbl_ref: [1, Npad, C] f32.
    """
    q = pl.program_id(1)
    qt = g_ref.shape[1]
    idx_row = idx_ref[0].astype(jnp.int32)  # [1, QT]
    g = g_ref[0]  # [QT, C]
    nchunks = _round_up(n, nk) // nk

    @pl.when(q == 0)
    def _init():
        dtbl_ref[0] = jnp.zeros_like(dtbl_ref[0])

    def body(k, _):
        # build the TRANSPOSED one-hot tile directly ([NK, QT]: table rows
        # on sublanes, queries on lanes) so the dot contracts a plain
        # (dim1, dim0) pair — no in-VMEM transposes
        iota = jax.lax.broadcasted_iota(jnp.int32, (nk, qt), 0)
        onehot_t = (iota == (idx_row - k * nk)).astype(g.dtype)
        contrib = jax.lax.dot_general(
            onehot_t,
            g,
            (((1,), (0,)), ((), ())),  # [NK, C] = onehotᵀ @ g
            precision=_dot_precision(g.dtype),
            preferred_element_type=jnp.float32,
        )
        dtbl_ref[0, pl.ds(k * nk, nk), :] += contrib
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def _gather_rows_pallas_fwd(table, idx, interpret: bool):
    """table: [B, N, C]; idx: [B, Q] int32 → [B, Q, C] (table dtype)."""
    b, n, c = table.shape
    q = idx.shape[1]
    assert n < (1 << 24), "f32 one-hot compare requires N < 2^24"
    npad = _round_up(max(n, _NK), _NK)
    qpad = _round_up(max(q, _QT), _QT)
    tbl_p = jnp.pad(table, ((0, 0), (0, npad - n), (0, 0)))
    idx_p = jnp.pad(idx.astype(jnp.float32), ((0, 0), (0, qpad - q)))
    out = pl.pallas_call(
        functools.partial(_gather_fwd_kernel, n=n, nk=_NK),
        grid=(b, qpad // _QT),
        in_specs=[
            pl.BlockSpec((1, npad, c), lambda bb, qq: (bb, 0, 0)),
            pl.BlockSpec((1, 1, _QT), lambda bb, qq: (bb, 0, qq)),
        ],
        out_specs=pl.BlockSpec((1, _QT, c), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, qpad, c), table.dtype),
        interpret=interpret,
    )(tbl_p, idx_p.reshape(b, 1, qpad))
    return out[:, :q]


def _gather_rows_pallas_bwd(idx, g, n: int, interpret: bool):
    """idx: [B, Q]; g: [B, Q, C] → d_table [B, N, C] fp32."""
    # idx rides as f32 inside the kernel (same transport as the forward);
    # beyond 2^24 rows the compare would silently alias — fail loudly.
    assert n < (1 << 24), "f32 one-hot compare requires N < 2^24"
    b, q = idx.shape
    c = g.shape[2]
    npad = _round_up(max(n, _NK), _NK)
    qpad = _round_up(max(q, _QT), _QT)
    idx_p = jnp.pad(
        idx.astype(jnp.float32), ((0, 0), (0, qpad - q)),
        constant_values=-1.0,  # padded queries match no table row
    )
    g_p = jnp.pad(g, ((0, 0), (0, qpad - q), (0, 0)))
    dtbl = pl.pallas_call(
        functools.partial(_gather_bwd_kernel, n=n, nk=_NK),
        grid=(b, qpad // _QT),
        in_specs=[
            pl.BlockSpec((1, 1, _QT), lambda bb, qq: (bb, 0, qq)),
            pl.BlockSpec((1, _QT, c), lambda bb, qq: (bb, qq, 0)),
        ],
        out_specs=pl.BlockSpec((1, npad, c), lambda bb, qq: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
        interpret=interpret,
    )(idx_p.reshape(b, 1, qpad), g_p)
    return dtbl[:, :n]


# -- GSPMD partitioning (same scheme as the lookup kernels: declare the
# factor structure; axes a shard must own whole are listed as
# need_replication_factors).  fwd partitions over batch and queries
# (table replicated across query shards); bwd contracts over q, so it
# partitions over batch only.
if _HAS_PALLAS:
    from jax.experimental.custom_partitioning import custom_partitioning

    def _batch_q_partition(local_fn, n_static: int, q_dims, out_q_dim):
        """Partition over dim 0 (batch) of every operand, plus the query
        dim (q_dims[i] per operand, None if absent) when sharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _axes(arg_infos):
            bspec = qspec = None
            for a, qd in zip(arg_infos, q_dims):
                s = a.sharding
                if isinstance(s, NamedSharding) and len(s.spec):
                    if bspec is None and s.spec[0] is not None:
                        bspec = s.spec[0]
                    if (
                        qspec is None
                        and qd is not None
                        and len(s.spec) > qd
                        and s.spec[qd] is not None
                    ):
                        qspec = s.spec[qd]
            return bspec, qspec

        def _spec(ndim, bspec, q_axis, qspec):
            return P(*[
                bspec if i == 0 else (qspec if i == q_axis else None)
                for i in range(ndim)
            ])

        def partition(*args):
            static = args[:n_static]
            mesh, arg_infos, result_infos = args[n_static:]
            bspec, qspec = _axes(arg_infos)
            arg_sh = tuple(
                NamedSharding(mesh, _spec(len(a.shape), bspec, qd, qspec))
                for a, qd in zip(arg_infos, q_dims)
            )
            res = (
                result_infos[0]
                if isinstance(result_infos, (list, tuple))
                else result_infos
            )
            out_sh = NamedSharding(
                mesh, _spec(len(res.shape), bspec, out_q_dim, qspec)
            )

            def lower_fn(*operands):
                return local_fn(*operands, *static)

            return mesh, lower_fn, out_sh, arg_sh

        def infer(*args):
            mesh, arg_infos, result_infos = args[n_static:]
            res = (
                result_infos[0]
                if isinstance(result_infos, (list, tuple))
                else result_infos
            )
            bspec, qspec = _axes(arg_infos)
            return NamedSharding(
                mesh, _spec(len(res.shape), bspec, out_q_dim, qspec)
            )

        return partition, infer

    _gather_fwd_sharded = custom_partitioning(
        _gather_rows_pallas_fwd, static_argnums=(2,)
    )
    _p, _i = _batch_q_partition(
        _gather_rows_pallas_fwd, 1, q_dims=(None, 1), out_q_dim=1
    )
    _gather_fwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="b n c, b q -> b q c",
        need_replication_factors=("n", "c"),
    )

    _gather_bwd_sharded = custom_partitioning(
        _gather_rows_pallas_bwd, static_argnums=(2, 3)
    )
    _p, _i = _batch_q_partition(
        _gather_rows_pallas_bwd, 2, q_dims=(None, None), out_q_dim=None
    )
    _gather_bwd_sharded.def_partition(
        partition=_p,
        infer_sharding_from_operands=_i,
        sharding_rule="b q, b q c -> b n c",
        need_replication_factors=("q", "n", "c"),
    )
else:  # pragma: no cover
    _gather_fwd_sharded = _gather_bwd_sharded = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_rows_cv(table, idx, n: int, dtype_name: str, interpret: bool):
    return _gather_fwd_sharded(table, idx, interpret)


def _gather_rows_vjp_fwd(table, idx, n, dtype_name, interpret):
    return _gather_rows_cv(table, idx, n, dtype_name, interpret), idx


def _gather_rows_vjp_bwd(n, dtype_name, interpret, idx, g):
    # keep the cotangent in its own dtype (bf16 in training): the one-hot
    # dot accumulates in f32 regardless (preferred_element_type), which is
    # strictly tighter than the jnp path's bf16 .at[].add accumulation,
    # while a f32 upcast would force the 6-pass HIGHEST matmul (measured
    # 4x slower bwd)
    dtbl = _gather_bwd_sharded(idx, g, n, interpret)
    return dtbl.astype(jnp.dtype(dtype_name)), None


_gather_rows_cv.defvjp(_gather_rows_vjp_fwd, _gather_rows_vjp_bwd)


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    """out[b, q, :] = table[b, idx[b, q], :] — MXU one-hot-tile gather.

    table: [B, N, C] (bf16/fp32); idx: [B, Q] int32 in [0, N).
    Returns [B, Q, C] in table's dtype.  Differentiable in `table`
    (scatter-add transpose, duplicates summed); idx carries no gradient.
    """
    return _gather_rows_cv(
        table, idx, table.shape[1], jnp.dtype(table.dtype).name, interpret
    )


# -- hybrid: XLA row-gather forward + Pallas one-hot scatter backward.
# On-chip (tools/kbench_gather.py, 2026-08-20): XLA's forward gather is
# DMA-driven and beats the one-hot matmul at every production shape, but
# its scatter-add TRANSPOSE is 2-3x slower than the Pallas accumulation
# for small-N tables — so the fastest differentiable gather pairs them.


def _jnp_gather(table, idx):
    return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(table, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_rows_hybrid_cv(table, idx, n: int, dtype_name: str,
                           interpret: bool):
    return _jnp_gather(table, idx)


def _gather_hybrid_vjp_fwd(table, idx, n, dtype_name, interpret):
    return _gather_rows_hybrid_cv(table, idx, n, dtype_name, interpret), idx


_gather_rows_hybrid_cv.defvjp(_gather_hybrid_vjp_fwd, _gather_rows_vjp_bwd)


def gather_rows_hybrid(table: jnp.ndarray, idx: jnp.ndarray,
                       interpret: bool = False):
    """Same contract as gather_rows; XLA forward, Pallas backward."""
    return _gather_rows_hybrid_cv(
        table, idx, table.shape[1], jnp.dtype(table.dtype).name, interpret
    )
