"""Global merge-path partitioning of a CSR matrix into per-shard shares.

Each shard receives an equal share of `num_rows + num_nonzeros` merge items
— the same equal-work guarantee the OMP kernel gives threads
(cpu_spmv.cpp:313-321) — found by the diagonal binary search on the global
row-end offsets.  Shares are padded to common static shapes (SPMD requires
identical per-device shapes); padding is bounded by 1 merge item per shard
plus row/nnz skew between shares, so it stays small by construction.

A share may start/end mid-row; every shard therefore computes a full local
SpMV over its *local* row window and the spanning-row partials are summed
across shards by `distributed_csrmv`'s carry exchange.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.merge_path import merge_path_search_np

__all__ = ["MergePartition", "partition_csr"]


@dataclasses.dataclass
class MergePartition:
    """Host-side padded per-shard CSR shares, ready for device_put.

    Shapes: values/cols [S, nnz_max]; rowends_local [S, rows_max] (local
    end offsets relative to the share's nnz window, clipped to it);
    meta [S, 4] = (row_start, nnz_start, local_rows, local_nnz).
    """
    num_shards: int
    num_rows: int
    num_cols: int
    num_nonzeros: int
    rows_max: int
    nnz_max: int
    values: np.ndarray          # [S, nnz_max] value dtype
    col_indices: np.ndarray     # [S, nnz_max] int32
    rowends_local: np.ndarray   # [S, rows_max] int32
    meta: np.ndarray            # [S, 4] int32
    row_starts: np.ndarray      # [S + 1] int32 (ownership boundaries)

    def to_device_sharded(self, mesh, axis="shards"):
        """Place shares shard-per-device along `axis` of `mesh`."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, sh)
        return (put(self.values), put(self.col_indices),
                put(self.rowends_local), put(self.meta))


def partition_csr(csr: CsrMatrix, num_shards: int,
                  dtype=np.float32) -> MergePartition:
    """Split `csr` into `num_shards` equal-merge-work shares."""
    n, nnz = csr.num_rows, csr.num_nonzeros
    total = n + nnz
    per = -(-total // num_shards)
    diags = np.minimum(np.arange(num_shards + 1, dtype=np.int64) * per, total)
    xs, ys = merge_path_search_np(diags, csr.row_end_offsets, nnz)
    row_starts = xs.astype(np.int64)     # completed-row boundaries
    nnz_starts = ys.astype(np.int64)

    # Local row window of shard s: rows [row_starts[s], row_starts[s+1]]
    # (inclusive end: the spanning row's head items live in this share).
    local_rows = np.maximum(row_starts[1:] - row_starts[:-1], 0)
    spans = (nnz_starts[1:] > csr.row_end_offsets[
        np.minimum(np.maximum(row_starts[1:] - 1, 0), n - 1)]
    ) if n > 0 else np.zeros(num_shards, bool)
    # include the spanning row in the local window when the share ends
    # mid-row (its partial is carried out)
    local_rows = local_rows + (row_starts[1:] < n).astype(np.int64)
    local_nnz = nnz_starts[1:] - nnz_starts[:-1]

    rows_max = int(local_rows.max()) if num_shards else 0
    nnz_max = int(local_nnz.max()) if num_shards else 0
    # pad to lane multiples for clean device layouts
    rows_max = max(8, -(-rows_max // 128) * 128)
    nnz_max = max(8, -(-nnz_max // 128) * 128)

    values = np.zeros((num_shards, nnz_max), dtype=dtype)
    cols = np.zeros((num_shards, nnz_max), dtype=np.int32)
    rowends = np.zeros((num_shards, rows_max), dtype=np.int32)
    meta = np.zeros((num_shards, 4), dtype=np.int32)

    re_global = csr.row_end_offsets
    for s in range(num_shards):
        r0, r1 = row_starts[s], row_starts[s] + local_rows[s]
        z0, z1 = nnz_starts[s], nnz_starts[s + 1]
        ln = z1 - z0
        values[s, :ln] = csr.values[z0:z1].astype(dtype)
        cols[s, :ln] = csr.col_indices[z0:z1]
        lr = r1 - r0
        # local row-end offsets: clipped to this share's nnz window
        rowends[s, :lr] = np.clip(re_global[r0:r1].astype(np.int64) - z0,
                                  0, ln).astype(np.int32)
        rowends[s, lr:] = ln   # padding rows: empty at end
        meta[s] = (r0, z0, lr, ln)

    return MergePartition(
        num_shards=num_shards, num_rows=n, num_cols=csr.num_cols,
        num_nonzeros=nnz, rows_max=rows_max, nnz_max=nnz_max,
        values=values, col_indices=cols, rowends_local=rowends, meta=meta,
        row_starts=xs.astype(np.int32))
