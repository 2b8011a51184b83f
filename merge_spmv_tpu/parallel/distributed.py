"""SPMD merge-path CsrMV over a device mesh (`jax.shard_map`).

Per-shard flow (each device owns one equal-merge-work share from
partition.py):

1. **x halo exchange** (halo mode): x lives sharded as [S, cpad] column
   blocks; two neighbor `ppermute`s move the `halo`-wide block edges so
   each shard holds [left_halo | own_block | right_halo] — the
   collectives ride the ICI neighbor links, nothing is replicated.
   Replicate mode (windows span the mesh) passes the full x through
   unchanged (v1 behavior, correct for any matrix).
2. **local SpMV** over the share's padded CSR window (the share may start
   and end mid-row — exactly like an OMP thread's share,
   cpu_spmv.cpp:324-344), column indices already window-local.
3. **carry reduce-scatter**: shard s's spanning-row partial is one scalar
   whose destination shard was precomputed at partition time (it is
   always the destination's FIRST local row — see partition.py).  One
   `psum_scatter` of S scalars delivers every shard the sum of foreign
   partials for its first row.  This is the SPMD realization of the
   reference's carry fix-up (serial loop cpu_spmv.cpp:347-353; fixup
   kernel agent_segment_fixup.cuh) with the look-back machinery replaced
   by a single collective.
4. output stays row-sharded as per-shard windows (exclusive after the
   exchange); `materialize_y` assembles the dense global vector.
"""

from __future__ import annotations

import numpy as np

from merge_spmv_tpu.parallel.partition import MergePartition

__all__ = ["distributed_csrmv", "distributed_csrmv_fn", "materialize_y"]


def _local_csrmv_xla(values, cols, rowends_local, x, nnz_max):
    """Local segment-sum SpMV over one padded share (device code)."""
    import jax
    import jax.numpy as jnp

    j = jnp.arange(nnz_max, dtype=jnp.int32)
    row_ids = jnp.searchsorted(rowends_local, j, side="right").astype(jnp.int32)
    products = values * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(products, row_ids,
                               num_segments=rowends_local.shape[0])


def distributed_csrmv_fn(mesh, part: MergePartition, axis: str = "shards",
                         alpha: float = 1.0, local_backend: str = "auto"):
    """Build the jitted SPMD csrmv for a fixed partition.

    Returns fn(values_sh, cols_sh, rowends_sh, meta_sh, x) -> y windows
    [S, rows_max] sharded along `axis`.  x is [S, cpad] sharded in halo
    mode, or the replicated global [C] otherwise.

    ``local_backend``: the per-shard SpMV. "pallas" runs the merge-path
    kernel on each chip (interpret mode off-TPU); "xla" the segment-sum
    formulation; "auto" picks pallas on TPU meshes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    S = part.num_shards
    rows_max = part.rows_max
    nnz_max = part.nnz_max
    halo_mode = part.x_mode == "halo"
    H = part.halo
    cpad = part.cpad

    platform = mesh.devices.flat[0].platform
    if local_backend == "auto":
        local_backend = "pallas" if platform == "tpu" else "xla"
    local_plan = None
    if local_backend == "pallas":
        from merge_spmv_tpu.ops.plan import make_plan
        local_plan = make_plan(rows_max, part.local_x_width, nnz_max,
                               dtype="float32", backend="pallas")

    def shard_body(values, cols, rowends, meta, x):
        # shapes: [1, nnz_max], [1, rows_max], [1, 6];
        # x: [1, cpad] (halo) or replicated [C]
        values = values[0]
        cols = cols[0]
        rowends = rowends[0]
        owned = meta[0, 4]
        carry_dst = meta[0, 5]

        if halo_mode:
            xb = x[0]
            if H and S > 1:
                lh = jax.lax.ppermute(
                    xb[cpad - H:], axis,
                    perm=[(i, i + 1) for i in range(S - 1)])
                rh = jax.lax.ppermute(
                    xb[:H], axis, perm=[(i, i - 1) for i in range(1, S)])
                x_loc = jnp.concatenate([lh, xb, rh])
            else:
                x_loc = xb
        else:
            x_loc = x

        if local_plan is not None:
            from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas
            y_local = csrmv_pallas(local_plan, values, rowends, cols,
                                   alpha * x_loc,
                                   interpret=platform != "tpu")
        else:
            y_local = _local_csrmv_xla(values, cols, rowends,
                                       alpha * x_loc, nnz_max)

        # carry out: partial of the spanning row (window index `owned`,
        # present iff owned < local_rows); routed by precomputed dst
        local_rows = meta[0, 2]
        spanning = owned < local_rows
        carry_val = jnp.where(
            spanning,
            jnp.take(y_local, jnp.minimum(owned, rows_max - 1)), 0.0)
        routed = jnp.zeros((S,), y_local.dtype).at[carry_dst].set(carry_val)
        # reduce-scatter: shard d receives sum of carries routed to d —
        # by construction all of them target d's first local row
        received = jax.lax.psum_scatter(routed, axis, scatter_dimension=0,
                                        tiled=True)

        w = jnp.arange(rows_max, dtype=jnp.int32)
        y_owned = jnp.where(w < owned, y_local, 0.0)
        y_owned = y_owned.at[0].add(received[0])
        return y_owned[None]

    x_spec = P(axis) if halo_mode else P()
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), x_spec),
        out_specs=P(axis),
        # pallas_call outputs do not carry varying-mesh-axis metadata yet
        check_vma=False)
    return jax.jit(mapped)


def distributed_csrmv(mesh, part: MergePartition, x, axis: str = "shards",
                      alpha: float = 1.0, local_backend: str = "auto"):
    """One-shot convenience: place shares, run, return sharded windows."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    arrays = part.to_device_sharded(mesh, axis)
    if part.x_mode == "halo":
        xr = jax.device_put(jnp.asarray(part.shard_x(x)),
                            NamedSharding(mesh, P(axis)))
    else:
        xr = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
    fn = distributed_csrmv_fn(mesh, part, axis, alpha, local_backend)
    return fn(*arrays, xr)


def materialize_y(y_windows, part: MergePartition) -> np.ndarray:
    """Assemble the dense global y from exclusive per-shard windows."""
    yw = np.asarray(y_windows)
    out = np.zeros(part.num_rows, dtype=yw.dtype)
    for s in range(part.num_shards):
        r0 = int(part.row_starts[s])
        r1 = int(part.row_starts[s + 1])
        if r1 > r0:
            out[r0:r1] += yw[s, :r1 - r0]
    return out
