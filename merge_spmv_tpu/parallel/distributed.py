"""SPMD merge-path CsrMV over a device mesh (`jax.shard_map`).

Per-shard flow (each device owns one equal-merge-work share from
partition.py):

1. local SpMV over the share's padded CSR window (the share may start and
   end mid-row — exactly like an OMP thread's share, cpu_spmv.cpp:324-344),
2. **carry exchange**: each shard's spanning-row partial is a single
   (row, value) pair; one tiny `all_gather` lets the owning shard fold in
   every foreign partial — the SPMD realization of the serial carry fix-up
   loop (cpu_spmv.cpp:347-353) and the TPU analog of the GPU fix-up kernel,
3. output stays row-sharded as per-shard windows (exclusive after the
   exchange); `materialize_y` assembles the dense global vector when needed.

x is replicated across the mesh in v1 (all-gathered once by the caller's
sharding); per-share halo windows ride in a later revision.
"""

from __future__ import annotations

import functools

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
    [S, rows_max] sharded along `axis`; x replicated.

    ``local_backend``: the per-shard SpMV. "pallas" runs the merge-path
    kernel on each chip (interpret mode off-TPU); "xla" the segment-sum
    formulation; "auto" picks pallas on TPU meshes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    S = part.num_shards
    rows_max = part.rows_max
    nnz_max = part.nnz_max
    num_rows = part.num_rows

    platform = mesh.devices.flat[0].platform
    if local_backend == "auto":
        local_backend = "pallas" if platform == "tpu" else "xla"
    local_plan = None
    if local_backend == "pallas":
        from merge_spmv_tpu.ops.plan import make_plan
        local_plan = make_plan(rows_max, part.num_cols, nnz_max,
                               dtype="float32", backend="pallas")

    def shard_body(values, cols, rowends, meta, x):
        # shapes: [1, nnz_max], [1, rows_max], [1, 4], x replicated [C]
        values = values[0]
        cols = cols[0]
        rowends = rowends[0]
        r0 = meta[0, 0]
        local_rows = meta[0, 2]

        if local_plan is not None:
            from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas
            y_local = csrmv_pallas(local_plan, values, rowends, cols,
                                   alpha * x, interpret=platform != "tpu")
        else:
            y_local = _local_csrmv_xla(values, cols, rowends, alpha * x,
                                       nnz_max)

        # ownership: rows [r0, r0 + owned) are mine; the spanning row (if
        # any) is the window's last row and belongs to a later shard.
        my_id = jax.lax.axis_index(axis)
        # owned rows = row_starts[s+1] - row_starts[s]; infer from carries:
        # window has local_rows rows; the last is spanning iff its end is
        # clipped — the partition already encoded owned count implicitly:
        # owned = local_rows - spanning. We transmit it via meta[3] slot:
        # (meta layout: r0, nnz0, local_rows, local_nnz) — spanning rows
        # carry forward; owned is recovered from gathered row starts.
        all_meta = jax.lax.all_gather(meta[0], axis)          # [S, 4]
        r0_all = all_meta[:, 0]
        next_r0 = jnp.where(jnp.arange(S) + 1 < S,
                            jnp.roll(r0_all, -1),
                            num_rows)
        owned = next_r0[my_id] - r0

        w = jnp.arange(rows_max, dtype=jnp.int32)
        # carry out: partial of global row next_r0[me] (window index owned)
        spanning = owned < local_rows
        carry_val = jnp.where(
            spanning, jnp.take(y_local, jnp.minimum(owned, rows_max - 1)), 0.0)
        carry_row = jnp.where(spanning, r0 + owned, jnp.int32(num_rows))

        carry_vals = jax.lax.all_gather(carry_val, axis)      # [S]
        carry_rows = jax.lax.all_gather(carry_row, axis)      # [S]

        y_owned = jnp.where(w < owned, y_local, 0.0)
        # fold in foreign partials targeting my owned rows (my own carry
        # targets w == owned, excluded by the ownership mask)
        hit = (carry_rows[:, None] == (r0 + w)[None, :]) & (w < owned)[None, :]
        y_owned = y_owned + jnp.sum(jnp.where(hit, carry_vals[:, None], 0.0),
                                    axis=0)
        return y_owned[None]

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
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
