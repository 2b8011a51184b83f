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

v2 additions (round 2):

* **Carry routing precomputed.**  The row spanning shard s's end boundary
  completes in exactly one later shard — and it is always that shard's
  FIRST local row (proof: the carry row crosses every intermediate
  boundary, and only one row can span a boundary).  `carry_dst` is
  therefore a static property of the partition; the runtime exchange
  becomes one `psum_scatter` (reduce-scatter) of S scalars with the
  received sum folded at local row 0 — no gather, no search, no hit
  matrix.  This replaces both v1 all-gathers (meta + carries).
* **x halo sharding.**  x is sharded into S contiguous column blocks; at
  partition time the per-shard column windows decide `x_mode`:
  "halo" (every window fits own block ± `halo` columns → two neighbor
  `ppermute` edge exchanges per call) or "replicate" (windows span the
  mesh → x stays replicated, v1 behavior).  Column indices are
  pre-shifted to window-local in halo mode, so the local SpMV is
  oblivious.  This is the distributed analog of the per-tile x window
  streaming in the single-chip kernel (csrmv_pallas.py).
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
    meta [S, 6] = (row_start, nnz_start, local_rows, local_nnz, owned,
    carry_dst).
    """
    num_shards: int
    num_rows: int
    num_cols: int
    num_nonzeros: int
    rows_max: int
    nnz_max: int
    values: np.ndarray          # [S, nnz_max] value dtype
    col_indices: np.ndarray     # [S, nnz_max] int32 (window-local in halo)
    rowends_local: np.ndarray   # [S, rows_max] int32
    meta: np.ndarray            # [S, 6] int32
    row_starts: np.ndarray      # [S + 1] int32 (ownership boundaries)
    x_mode: str = "replicate"   # "halo" | "replicate"
    cpad: int = 0               # x block columns per shard (128-multiple)
    halo: int = 0               # halo columns each side (128-multiple)

    @property
    def local_x_width(self) -> int:
        """Columns visible to one shard's local SpMV."""
        if self.x_mode == "halo":
            return self.cpad + 2 * self.halo
        return self.num_cols

    def shard_x(self, x) -> np.ndarray:
        """Pad + reshape the global x into [S, cpad] column blocks."""
        x = np.asarray(x)
        out = np.zeros((self.num_shards, self.cpad), dtype=x.dtype)
        flat = out.reshape(-1)
        flat[:x.shape[0]] = x
        return out

    def to_device_sharded(self, mesh, axis="shards"):
        """Place shares shard-per-device along `axis` of `mesh`."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, sh)
        return (put(self.values), put(self.col_indices),
                put(self.rowends_local), put(self.meta))


def partition_csr(csr: CsrMatrix, num_shards: int,
                  dtype=np.float32, allow_halo_x: bool = True
                  ) -> MergePartition:
    """Split `csr` into `num_shards` equal-merge-work shares."""
    n, nnz = csr.num_rows, csr.num_nonzeros
    S = num_shards
    total = n + nnz
    per = -(-total // S)
    diags = np.minimum(np.arange(S + 1, dtype=np.int64) * per, total)
    xs, ys = merge_path_search_np(diags, csr.row_end_offsets, nnz)
    row_starts = xs.astype(np.int64)     # completed-row boundaries
    nnz_starts = ys.astype(np.int64)

    # Local row window of shard s: rows [row_starts[s], row_starts[s+1]]
    # (inclusive end: the spanning row's head items live in this share).
    owned = np.maximum(row_starts[1:] - row_starts[:-1], 0)
    local_rows = owned + (row_starts[1:] < n).astype(np.int64)
    local_nnz = nnz_starts[1:] - nnz_starts[:-1]

    # Carry routing (see module docstring): shard s's carry row is
    # row_starts[s+1]; it completes in the shard whose ownership range
    # contains it — static, so compute dst here.  Non-spanning shards
    # route a zero to themselves.
    carry_row = row_starts[1:]
    carry_dst = np.searchsorted(row_starts, carry_row, side="right") - 1
    carry_dst = np.clip(carry_dst, 0, S - 1).astype(np.int64)

    rows_max = int(local_rows.max()) if S else 0
    nnz_max = int(local_nnz.max()) if S else 0
    # pad to lane multiples for clean device layouts
    rows_max = max(8, -(-rows_max // 128) * 128)
    nnz_max = max(8, -(-nnz_max // 128) * 128)

    # x sharding decision: per-shard column windows vs own block ± halo
    cols_per_shard = -(-csr.num_cols // S)          # ceil
    cpad = max(128, -(-cols_per_shard // 128) * 128)  # 128-aligned
    x_mode, halo = "replicate", 0
    if allow_halo_x and S > 1 and nnz:
        lo = np.full(S, np.int64(csr.num_cols))
        hi = np.full(S, np.int64(-1))
        for s in range(S):
            z0, z1 = nnz_starts[s], nnz_starts[s + 1]
            if z1 > z0:
                cs = csr.col_indices[z0:z1]
                lo[s] = cs.min()
                hi[s] = cs.max()
        own0 = np.arange(S, dtype=np.int64) * cpad
        need_l = np.maximum(own0 - lo, 0)
        need_r = np.maximum(hi + 1 - (own0 + cpad), 0)
        H = int(max(need_l.max(), need_r.max()))
        H = -(-H // 128) * 128
        if H <= cpad:   # windows only reach immediate neighbors
            x_mode, halo = "halo", H

    values = np.zeros((S, nnz_max), dtype=dtype)
    cols = np.zeros((S, nnz_max), dtype=np.int32)
    rowends = np.zeros((S, rows_max), dtype=np.int32)
    meta = np.zeros((S, 6), dtype=np.int32)

    re_global = csr.row_end_offsets
    for s in range(S):
        r0, r1 = row_starts[s], row_starts[s] + local_rows[s]
        z0, z1 = nnz_starts[s], nnz_starts[s + 1]
        ln = z1 - z0
        values[s, :ln] = csr.values[z0:z1].astype(dtype)
        local_cols = csr.col_indices[z0:z1].astype(np.int64)
        if x_mode == "halo":
            local_cols = local_cols - (s * cpad - halo)
        cols[s, :ln] = local_cols.astype(np.int32)
        lr = r1 - r0
        # local row-end offsets: clipped to this share's nnz window
        rowends[s, :lr] = np.clip(re_global[r0:r1].astype(np.int64) - z0,
                                  0, ln).astype(np.int32)
        rowends[s, lr:] = ln   # padding rows: empty at end
        meta[s] = (r0, z0, lr, ln, owned[s], carry_dst[s])

    return MergePartition(
        num_shards=S, num_rows=n, num_cols=csr.num_cols,
        num_nonzeros=nnz, rows_max=rows_max, nnz_max=nnz_max,
        values=values, col_indices=cols, rowends_local=rowends, meta=meta,
        row_starts=xs.astype(np.int32), x_mode=x_mode, cpad=cpad, halo=halo)
