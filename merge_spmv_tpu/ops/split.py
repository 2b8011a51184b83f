"""Prepare-time matrix splitting for scattered-column matrices (opt-in).

The merge kernel's gather cost is proportional to the number of distinct
column chunks each 1024-nonzero block touches (ops/gather_plan.py).  A
matrix whose columns scatter over a wide range around the diagonal
(circuit/graph classes) forces O(range/1024) chunk visits per block — the
cost is matrix-intrinsic under the no-preprocessing contract.

This module trades one-time setup for per-call speed: the nonzeros are
split by signed diagonal distance into bands, and the bands are STACKED
VERTICALLY into one (num_bands * m, n) CSR over a virtual row space —
row r of band b becomes stacked row b*m + r.  Within a band each block's
columns span only the band's width, collapsing the per-block chunk-visit
count; and because the stack is a single CSR, the whole split runs as ONE
merge-kernel launch under ONE plan (one compile, one dispatch), finished
by a cheap ``y.reshape(B, m).sum(0)`` epilogue.  (Round-3 v1 chained B
separate per-band operators through beta=1 epilogues: B compiles, B
dispatches, and B-1 extra y read/write round trips — all structural
overhead the stack removes.)

Band edges come in two flavors:

* geometric ``edges_chunks=(8, 32)`` — fixed signed edges in 1024-column
  units, matched to exponentially-decaying off-diagonal densities;
* ``edges_chunks="quantile"`` with ``num_bands=B`` — signed-distance
  quantiles, equal-nnz bands for arbitrary distance profiles.

This is the TPU analog of the reference's cuSPARSE HybMV comparison point:
an ELL+COO *format split* whose setup time is measured and reported
separately from the multiply (gpu_spmv.cu:106-251, README.md:143-144 —
1059.8 ms setup for circuit5M).  The default operator remains strictly
no-preprocessing (README.md:5-7); `SplitSpmvOperator` is the documented
opt-in for scatter-heavy matrices, with `setup_ms` exposed.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Union

import numpy as np

from merge_spmv_tpu.formats.csr import CsrMatrix

__all__ = ["split_by_distance", "SplitSpmvOperator", "build_split_operator",
           "build_split_operator_device", "band_assignment", "stack_bands",
           "stack_bands_compact",
           "popularity_assignment", "HotColdSpmvOperator",
           "build_hotcold_operator"]


def _row_ids(csr: CsrMatrix) -> np.ndarray:
    lens = np.diff(csr.row_offsets)
    return np.repeat(np.arange(csr.num_rows, dtype=np.int32),
                     lens).astype(np.int32, copy=False)


def band_assignment(csr: CsrMatrix,
                    edges_chunks: Union[Sequence[int], str] = (8, 32),
                    num_bands: int = 5,
                    min_frac: float = 0.02,
                    row_ids: Optional[np.ndarray] = None):
    """Per-nonzero band ids from signed diagonal distance.

    Geometric mode (``edges_chunks`` a sequence): positive edges in
    1024-column units; the signed edge list becomes
    [-inf, -e_n..., -e_1, e_1, ..., e_n, inf].  Quantile mode
    (``edges_chunks == "quantile"``): ``num_bands`` equal-nnz bands from
    signed-distance quantiles, 1024-aligned.  Bands holding less than
    ``min_frac`` of the nonzeros are merged into their inner neighbor
    (they would pay per-band fixed costs for nothing).

    Returns (band, nbands): int8 ids in [0, nbands), densely renumbered
    in ascending-distance order.
    """
    if row_ids is None:
        row_ids = _row_ids(csr)
    # |col - row| < 2**31 always holds for int32 column indices, so the
    # distance fits int32 — half the temporary footprint of the int64 form
    d = csr.col_indices.astype(np.int32, copy=False) - row_ids
    if isinstance(edges_chunks, str):
        if edges_chunks != "quantile":
            raise ValueError(f"unknown edges mode {edges_chunks!r}")
        if num_bands < 2:
            return np.zeros(d.shape[0], np.int8), 1
        qs = np.quantile(d, np.arange(1, num_bands) / num_bands)
        signed_edges = np.unique((np.round(qs / 1024.0) * 1024
                                  ).astype(np.int64))
    else:
        edges = np.array(sorted({int(e) * 1024 for e in edges_chunks
                                 if e > 0}), dtype=np.int64)
        signed_edges = np.concatenate([-edges[::-1], edges])
    if signed_edges.size == 0:
        return np.zeros(d.shape[0], np.int8), 1
    # edges cast to d's dtype: int64 edges silently promote the whole
    # 56.7M-element distance array inside searchsorted (measured 103 s vs
    # 5.3 s at circuit5M scale on a fault-rate-limited host)
    band = np.searchsorted(signed_edges.astype(d.dtype), d,
                           side="left").astype(np.int8)
    nbands = len(signed_edges) + 1
    counts = np.bincount(band, minlength=nbands)
    # merge sub-threshold bands inward (towards the most-populated band —
    # in geometric mode that is the diagonal band; quantile bands are
    # near-equal so merging is rare)
    mid = int(np.argmax(counts))
    remap = np.arange(nbands, dtype=np.int8)
    thresh = min_frac * max(1, csr.num_nonzeros)
    for b in range(nbands):
        if counts[b] and counts[b] < thresh:
            step = 1 if b < mid else -1
            t = b
            while t != mid and (counts[t] < thresh or t == b):
                t += step
            remap[b] = t
    band = remap[band]
    # dense renumbering preserving distance order
    used = np.flatnonzero(np.bincount(band, minlength=nbands))
    renum = np.zeros(nbands, np.int8)
    renum[used] = np.arange(len(used), dtype=np.int8)
    return renum[band], len(used)


def stack_bands(csr: CsrMatrix, band: np.ndarray, nbands: int,
                row_ids: Optional[np.ndarray] = None,
                tile_items: int = 0) -> CsrMatrix:
    """Stack the bands vertically into one (nbands * m, n) CSR.

    A stable sort by band id preserves row-major order inside each band,
    so the permuted cols/values ARE the stacked CSR's arrays; the stacked
    row lengths are per-band bincounts over the sort's segments.  Empty
    rows are native to the merge path (sparse_matrix.h:707-727 backfill
    semantics), so sparse bands need no row compaction.

    ``tile_items``: when nonzero, band boundaries are aligned so the
    kernel's blocking never mixes bands: each band's row count is padded
    to m_pad = ceil(m/1024)*1024 virtual rows (trailing empties) and its
    nonzeros to nnz'_b ≡ -m_pad (mod tile_items) with zero-VALUED dummies
    on the band's last (virtual) row, whose column repeats the band's own
    last column.  Then every band starts on BOTH a 1024-nonzero gather
    block boundary (nnz'_b ≡ 0 mod 1024 since tile_items and m_pad are)
    and a merge-tile boundary (m_pad + nnz'_b ≡ 0 mod tile_items).
    Without the alignment, a gather block or tile straddling a band
    boundary mixes the last rows of band b (columns near n) with the
    first rows of band b+1 (columns near 0) — its x window then spans the
    whole matrix and blows the per-tile streaming budget, forcing the
    plan off the pallas backend.  Returns (stacked, m_pad).
    """
    if row_ids is None:
        row_ids = _row_ids(csr)
    m = csr.num_rows
    if nbands == 1:
        return csr, m
    m_pad = m
    if tile_items:
        assert tile_items % 1024 == 0
        m_pad = -(-m // 1024) * 1024
    order = np.argsort(band, kind="stable")
    # per-band bincounts over the order segments (a fused (band*m + row)
    # int64 key would cost two more 450 MB temporaries at circuit5M scale)
    bcounts = np.bincount(band, minlength=nbands)
    seg = np.concatenate([[0], np.cumsum(bcounts)])
    pad = np.zeros(nbands, np.int64)
    if tile_items:
        pad = (-(m_pad + bcounts)) % tile_items
    dst = np.concatenate([[0], np.cumsum(bcounts + pad)])
    total = int(dst[-1])
    rows_sorted = row_ids[order]
    cols_sorted = csr.col_indices[order]
    vals_sorted = csr.values[order]
    cols_s = np.empty(total, cols_sorted.dtype)
    vals_s = np.zeros(total, vals_sorted.dtype)
    row_offsets = np.zeros(nbands * m_pad + 1, dtype=np.int64)
    for b in range(nbands):
        s0, s1 = int(seg[b]), int(seg[b + 1])
        d0 = int(dst[b])
        cols_s[d0:d0 + s1 - s0] = cols_sorted[s0:s1]
        vals_s[d0:d0 + s1 - s0] = vals_sorted[s0:s1]
        if pad[b]:
            cols_s[d0 + s1 - s0:int(dst[b + 1])] = (
                cols_sorted[s1 - 1] if s1 > s0 else 0)
        lens_b = np.bincount(rows_sorted[s0:s1], minlength=m_pad)
        lens_b[m_pad - 1] += pad[b]
        row_offsets[1 + b * m_pad:1 + (b + 1) * m_pad] = lens_b
    np.cumsum(row_offsets[1:], out=row_offsets[1:])
    return CsrMatrix(nbands * m_pad, csr.num_cols, row_offsets,
                     cols_s, vals_s), m_pad


def stack_bands_compact(csr: CsrMatrix, band: np.ndarray, nbands: int,
                        row_ids: Optional[np.ndarray] = None,
                        tile_items: int = 0):
    """Stack bands with COMPACT per-band rows.

    ``stack_bands`` gives every band the full m_pad virtual rows; the
    round-5 phase probe measured that row explosion at 45 % of the split
    multiply (SPLIT_PHASE_PROBE.json: 6.4 of 14.1 ms at quarter-circuit
    scale — the merge row phase walks nb*m_pad stacked rows).  Here band
    b keeps only the rows that actually hold a band-b nonzero: stacked
    row rdst[b]+i is the i-th PRESENT row of band b.  The y epilogue can
    no longer be a reshape-sum; instead a setup-time permutation sorts
    the (band, present-row) slots by global row, and each call gathers
    the stacked y through it and runs a sorted-segment prefix-difference
    (csrmv_xla._sorted_segment_sum — compensated, so the rounding class
    is the comparator's documented one).

    Returns (stacked, gather_idx, seg_ends, present_counts):
    ``gather_idx`` int32 (R_total,) stacked-y positions sorted by global
    row; ``seg_ends`` int32 (m,) segment ends per global row.  Band
    alignment invariants match stack_bands (p_pad_b multiple of 1024;
    p_pad_b + nnz'_b ≡ 0 mod tile_items), so no gather block or merge
    tile mixes bands.
    """
    if row_ids is None:
        row_ids = _row_ids(csr)
    m = csr.num_rows
    assert tile_items and tile_items % 1024 == 0
    order = np.argsort(band, kind="stable")
    bcounts = np.bincount(band, minlength=nbands)
    seg = np.concatenate([[0], np.cumsum(bcounts)])
    rows_sorted = row_ids[order]
    cols_sorted = csr.col_indices[order]
    vals_sorted = csr.values[order]
    rows_list = []
    lens_list = []
    p_pads = []
    for b in range(nbands):
        s0, s1 = int(seg[b]), int(seg[b + 1])
        # rows within a band stay in ascending row-major order (stable)
        ur, cnts = np.unique(rows_sorted[s0:s1], return_counts=True)
        rows_list.append(ur.astype(np.int64))
        lens_list.append(cnts.astype(np.int64))
        p_pads.append(max(1024, -(-max(len(ur), 1) // 1024) * 1024))
    nnz_pad = [int((-(p_pads[b] + bcounts[b])) % tile_items)
               for b in range(nbands)]
    rdst = np.concatenate([[0], np.cumsum(p_pads)]).astype(np.int64)
    dst = np.concatenate([[0], np.cumsum(bcounts + np.asarray(nnz_pad))
                          ]).astype(np.int64)
    total = int(dst[-1])
    rows_total = int(rdst[-1])
    cols_s = np.empty(total, cols_sorted.dtype)
    vals_s = np.zeros(total, vals_sorted.dtype)
    row_offsets = np.zeros(rows_total + 1, dtype=np.int64)
    for b in range(nbands):
        s0, s1 = int(seg[b]), int(seg[b + 1])
        d0 = int(dst[b])
        cols_s[d0:d0 + s1 - s0] = cols_sorted[s0:s1]
        vals_s[d0:d0 + s1 - s0] = vals_sorted[s0:s1]
        if nnz_pad[b]:
            cols_s[d0 + s1 - s0:int(dst[b + 1])] = (
                cols_sorted[s1 - 1] if s1 > s0 else 0)
        lens_b = np.zeros(p_pads[b], np.int64)
        lens_b[:len(lens_list[b])] = lens_list[b]
        lens_b[p_pads[b] - 1] += nnz_pad[b]
        row_offsets[1 + rdst[b]:1 + rdst[b + 1]] = lens_b
    np.cumsum(row_offsets[1:], out=row_offsets[1:])
    stacked = CsrMatrix(rows_total, csr.num_cols, row_offsets,
                        cols_s, vals_s)
    rows_all = (np.concatenate(rows_list) if rows_list
                else np.zeros(0, np.int64))
    pos_all = np.concatenate(
        [rdst[b] + np.arange(len(rows_list[b]), dtype=np.int64)
         for b in range(nbands)]) if rows_list else np.zeros(0, np.int64)
    perm = np.argsort(rows_all, kind="stable")
    gather_idx = pos_all[perm].astype(np.int32)
    seg_ends = np.cumsum(np.bincount(rows_all, minlength=m)
                         ).astype(np.int32)
    return stacked, gather_idx, seg_ends, [len(r) for r in rows_list]


def _subset_csr(csr: CsrMatrix, mask: np.ndarray,
                row_ids: np.ndarray,
                cols: Optional[np.ndarray] = None,
                num_cols: Optional[int] = None) -> CsrMatrix:
    """CSR holding only the masked nonzeros; same rows.  ``cols`` replaces
    the selected column indices (already masked), ``num_cols`` the column
    count — used by the hot/cold split's compact remap."""
    sel_rows = row_ids[mask]
    counts = np.bincount(sel_rows, minlength=csr.num_rows)
    row_offsets = np.zeros(csr.num_rows + 1, dtype=csr.row_offsets.dtype)
    np.cumsum(counts, out=row_offsets[1:])
    if cols is None:
        cols = csr.col_indices[mask]
    return CsrMatrix(csr.num_rows,
                     csr.num_cols if num_cols is None else num_cols,
                     row_offsets, np.ascontiguousarray(cols),
                     np.ascontiguousarray(csr.values[mask]))


def split_by_distance(csr: CsrMatrix,
                      edges_chunks: Union[Sequence[int], str] = (8, 32),
                      min_frac: float = 0.02, num_bands: int = 5):
    """Split into per-band CsrMatrix views (each a valid CSR over the SAME
    rows).  Returns (bands, band_ids).  The operator path uses the stacked
    form (stack_bands) instead; this materialized form serves analysis and
    the partition tests."""
    row_ids = _row_ids(csr)
    band, nbands = band_assignment(csr, edges_chunks, num_bands=num_bands,
                                   min_frac=min_frac, row_ids=row_ids)
    bands = [_subset_csr(csr, band == b, row_ids) for b in range(nbands)]
    return bands, band


class SplitSpmvOperator:
    """Banded SpMV via one stacked-band kernel launch.

    y = alpha * A @ x + beta * y_in runs as y_v = A_stacked @ (alpha*x)
    (one merge-kernel call over the (B*m, n) stack), then the epilogue
    y = y_v.reshape(B, m).sum(0) + beta*y_in — a single XLA reduction.

    ``setup_ms`` records the split + prepare cost — report it the way the
    reference reports HYB conversion time (gpu_spmv.cu:114-134).
    """

    def __init__(self, csr: CsrMatrix, dtype="float32",
                 edges_chunks: Union[Sequence[int], str] = (8, 32),
                 num_bands: int = 5,
                 tile_items: Optional[int] = None,
                 compact_rows: Optional[bool] = None):
        from merge_spmv_tpu.ops.operator import build_operator

        from merge_spmv_tpu.ops.plan import make_plan

        t0 = time.perf_counter()
        row_ids = _row_ids(csr)
        band, nb = band_assignment(csr, edges_chunks, num_bands=num_bands,
                                   row_ids=row_ids)
        self.num_bands = nb
        self.num_rows = csr.num_rows
        self.band_nnz = np.bincount(band, minlength=nb).tolist()
        # resolve the tile size BEFORE stacking: bands are padded to tile
        # boundaries so no merge tile straddles a band (see stack_bands)
        if tile_items is None:
            tile_items = make_plan(nb * csr.num_rows, csr.num_cols,
                                   csr.num_nonzeros, dtype=dtype).tile_items
        self._gather_idx = None
        self._seg_ends = None
        # compact rows cut the stacked KERNEL 26-31 % (row phase is 45 %
        # of the multiply, SPLIT_PHASE_PROBE.json) but the re-expansion
        # epilogue is an ~R_total-element permutation gather with ~1-run
        # granularity, which XLA's TPU gather serves at ~14.6 ns/elem —
        # 118 ms at quarter-circuit scale, 9x the kernel saving
        # (SPLIT_COMPACT.json).  Opt-in only; never auto-chosen.
        use_compact = bool(compact_rows)
        if use_compact and nb > 1:
            import jax.numpy as jnp
            (self.stacked, gidx, sends, self.band_rows
             ) = stack_bands_compact(csr, band, nb, row_ids=row_ids,
                                     tile_items=tile_items)
            self._m_pad = 0
            self._gather_idx = jnp.asarray(gidx)
            self._seg_ends = jnp.asarray(sends)
        else:
            self.stacked, self._m_pad = stack_bands(csr, band, nb,
                                                    row_ids=row_ids,
                                                    tile_items=tile_items)
        self.op = build_operator(self.stacked, dtype=dtype,
                                 tile_items=tile_items)
        self.plan = self.op.plan
        self.setup_ms = (time.perf_counter() - t0) * 1e3

    @classmethod
    def from_stacked(cls, op, num_bands: int, m_pad: int, num_rows: int,
                     band_nnz, setup_ms: float) -> "SplitSpmvOperator":
        """Wrap an already-built stacked operator (the device-side
        builder's path, ``build_split_operator_device``)."""
        self = object.__new__(cls)
        self.op = op
        self.plan = op.plan
        self.num_bands = int(num_bands)
        self._m_pad = int(m_pad)
        self.num_rows = int(num_rows)
        self.band_nnz = list(band_nnz)
        self.stacked = None   # device-built: no host CsrMatrix exists
        self._gather_idx = None
        self._seg_ends = None
        self.setup_ms = float(setup_ms)
        return self

    def __call__(self, x, y_in=None, alpha=1.0, beta=0.0,
                 interpret: bool = False):
        import jax.numpy as jnp
        y_v = self.op(x, alpha=alpha, interpret=interpret)
        if self._gather_idx is not None:
            # compact-row epilogue: gather the stacked y through the
            # setup-time row-sorted permutation, then one sorted-segment
            # prefix-difference per global row
            from merge_spmv_tpu.ops.csrmv_xla import _sorted_segment_sum
            yv = jnp.take(y_v, self._gather_idx, axis=0)
            y = _sorted_segment_sum(yv, self._seg_ends)
        else:
            y = y_v.reshape(self.num_bands,
                            self._m_pad)[:, :self.num_rows].sum(axis=0)
        if y_in is not None:
            y = y + jnp.asarray(beta, y.dtype) * y_in
        return y

    def mm(self, X, Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
           method: str = "auto"):
        import jax.numpy as jnp
        Y_v = self.op.mm(X, alpha=alpha, interpret=interpret, method=method)
        k = Y_v.shape[1]
        if self._gather_idx is not None:
            from merge_spmv_tpu.ops.csrmv_xla import _sorted_segment_sum_2d
            Yv = jnp.take(Y_v, self._gather_idx, axis=0)
            Y = _sorted_segment_sum_2d(Yv, self._seg_ends)
        else:
            Y = Y_v.reshape(self.num_bands, self._m_pad,
                            k)[:, :self.num_rows].sum(axis=0)
        if Y_in is not None:
            Y = Y + jnp.asarray(beta, Y.dtype) * Y_in
        return Y

    def describe(self) -> str:
        parts = ", ".join(str(n) for n in self.band_nnz)
        return (f"SplitSpmvOperator({self.num_bands} bands stacked, "
                f"nnz=[{parts}], setup={self.setup_ms:.0f} ms)")


def popularity_assignment(csr: CsrMatrix,
                          coverage: float = 0.5,
                          max_hot_windows: int = 4096,
                          min_gain: float = 2.0):
    """Select hot 128-column windows by nonzero popularity.

    The gather ladder's adversary is the powerlaw-column class
    (kron_g500 / webbase): popular columns scatter over the whole column
    space, so every 1024-nnz block touches many distinct x windows and
    the plan degrades to the dynamic range walk.  Compacting the popular
    columns into a dense prefix collapses those visits: 8 formerly
    scattered hub windows re-map into one.

    Windows are taken in descending nnz count while (a) a window still
    holds ≥ ``min_gain`` × the mean per-window count (a flat profile
    selects nothing — circuit-class matrices stay on the banded split),
    (b) cumulative coverage < ``coverage``, (c) at most
    ``max_hot_windows`` (the compact x prefix is 512 B per window; 4096
    windows = 2 MB, VMEM-resident).  Returns ``(hot_mask, hot_windows)``
    — per-nonzero bool mask and the ASCENDING window ids (ascending
    order preserves whatever original column locality the hot set has).
    Empty hot set ⇒ the split is not worth a second kernel launch.
    """
    if csr.num_nonzeros == 0:
        return np.zeros(0, bool), np.empty(0, np.int64)
    nwin = max(1, -(-csr.num_cols // 128))
    win = (csr.col_indices >> 7).astype(np.int32, copy=False)
    wcount = np.bincount(win, minlength=nwin)
    order = np.argsort(wcount)[::-1]
    csum = np.cumsum(wcount[order])
    mean = csr.num_nonzeros / max(1, int((wcount > 0).sum()))
    take = int(np.searchsorted(csum, coverage * csr.num_nonzeros,
                               side="left") + 1)
    take = min(take, max_hot_windows, nwin)
    # drop trailing windows below the gain threshold
    counts_desc = wcount[order[:take]]
    good = counts_desc >= min_gain * mean
    take = int(np.argmin(good)) if not good.all() else take
    if take == 0 or csum[take - 1] < 0.10 * csr.num_nonzeros:
        return np.zeros(csr.num_nonzeros, bool), np.empty(0, np.int64)
    hot_windows = np.sort(order[:take])
    rank = np.full(nwin, -1, np.int32)
    rank[hot_windows] = np.arange(take, dtype=np.int32)
    return rank[win] >= 0, hot_windows


class HotColdSpmvOperator:
    """Hot/cold column split: popular columns compacted, rest streamed.

    Prepare time partitions the nonzeros by 128-column window popularity
    (``popularity_assignment``).  The HOT part's columns are re-mapped to
    a compact prefix ``rank(window)*128 + (col % 128)`` so its x vector
    is a small dense gather ``x[hot_cols]`` (one XLA gather per call,
    VMEM-resident inside the kernel); the COLD part keeps the original
    columns and whatever plan the ladder picks for its (now minority)
    scatter.  y = hot(x_hot) then cold(x, y_in=y, beta=1) — two launches,
    each with the plan its column profile deserves.

    This is the TPU analog of the hot working set the reference gets for
    free from the GPU texture/L2 cache on power-law columns (the x reads
    in agent_spmv_orig.cuh:471-524 hit cache for hub columns); on TPU the
    hot set must be pinned explicitly.  Like ``SplitSpmvOperator`` it is
    a documented opt-in that trades one-time setup for per-call speed
    (the reference reports HYB conversion setup the same way,
    gpu_spmv.cu:114-134); ``setup_ms`` is exposed.
    """

    def __init__(self, csr: CsrMatrix, dtype="float32",
                 coverage: float = 0.5, max_hot_windows: int = 4096,
                 min_gain: float = 2.0,
                 tile_items: Optional[int] = None,
                 backend: str = "auto"):
        import jax.numpy as jnp

        from merge_spmv_tpu.ops.operator import build_operator

        t0 = time.perf_counter()
        hot_mask, hot_windows = popularity_assignment(
            csr, coverage=coverage, max_hot_windows=max_hot_windows,
            min_gain=min_gain)
        self.num_rows = csr.num_rows
        self.num_cols = csr.num_cols
        self.num_hot_windows = int(hot_windows.size)
        self.hot_nnz = int(hot_mask.sum())
        self.cold_nnz = csr.num_nonzeros - self.hot_nnz
        self.hot_op = None
        self.cold_op = None
        self._xidx = None
        row_ids = _row_ids(csr)
        if self.num_hot_windows:
            rank = np.full(max(1, -(-csr.num_cols // 128)), -1, np.int32)
            rank[hot_windows] = np.arange(self.num_hot_windows,
                                          dtype=np.int32)
            sel_cols = csr.col_indices[hot_mask]
            new_cols = (rank[sel_cols >> 7] * 128
                        + (sel_cols & 127)).astype(np.int32)
            hot_csr = _subset_csr(csr, hot_mask, row_ids, cols=new_cols,
                                  num_cols=self.num_hot_windows * 128)
            self.hot_op = build_operator(hot_csr, dtype=dtype,
                                         tile_items=tile_items,
                                         backend=backend)
            # original column of each compact slot (clamped: slots past
            # num_cols in the last window are never referenced)
            flat = (hot_windows[:, None] * 128
                    + np.arange(128)[None, :]).ravel()
            self._xidx = jnp.asarray(
                np.minimum(flat, csr.num_cols - 1).astype(np.int32))
        if self.cold_nnz or not self.num_hot_windows:
            cold_csr = _subset_csr(csr, ~hot_mask, row_ids)
            self.cold_op = build_operator(cold_csr, dtype=dtype,
                                          tile_items=tile_items,
                                          backend=backend)
        self.plan = (self.cold_op or self.hot_op).plan
        self.setup_ms = (time.perf_counter() - t0) * 1e3

    def __call__(self, x, y_in=None, alpha=1.0, beta=0.0,
                 interpret: bool = False):
        import jax.numpy as jnp
        y = None
        if self.hot_op is not None:
            x_hot = jnp.take(jnp.asarray(x), self._xidx)
            y = self.hot_op(x_hot, alpha=alpha, interpret=interpret)
        if self.cold_op is not None:
            y = self.cold_op(x, y_in=y, alpha=alpha,
                             beta=0.0 if y is None else 1.0,
                             interpret=interpret)
        if y_in is not None:
            y = y + jnp.asarray(beta, y.dtype) * y_in
        return y

    def mm(self, X, Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
           method: str = "auto"):
        import jax.numpy as jnp
        Y = None
        if self.hot_op is not None:
            X_hot = jnp.take(jnp.asarray(X), self._xidx, axis=0)
            Y = self.hot_op.mm(X_hot, alpha=alpha, interpret=interpret,
                               method=method)
        if self.cold_op is not None:
            Y = self.cold_op.mm(X, Y_in=Y, alpha=alpha,
                                beta=0.0 if Y is None else 1.0,
                                interpret=interpret, method=method)
        if Y_in is not None:
            Y = Y + jnp.asarray(beta, Y.dtype) * Y_in
        return Y

    def describe(self) -> str:
        hot = (f"{self.num_hot_windows} hot windows, nnz {self.hot_nnz}"
               if self.num_hot_windows else "no hot set")
        return (f"HotColdSpmvOperator({hot} / cold nnz {self.cold_nnz}, "
                f"setup={self.setup_ms:.0f} ms)")


def build_hotcold_operator(csr: CsrMatrix, dtype="float32",
                           coverage: float = 0.5,
                           max_hot_windows: int = 4096,
                           min_gain: float = 2.0,
                           tile_items: Optional[int] = None,
                           backend: str = "auto") -> HotColdSpmvOperator:
    """Build the hot/cold popularity-split operator (see class docs)."""
    return HotColdSpmvOperator(csr, dtype=dtype, coverage=coverage,
                               max_hot_windows=max_hot_windows,
                               min_gain=min_gain, tile_items=tile_items,
                               backend=backend)


def build_split_operator(csr: CsrMatrix, dtype="float32",
                         edges_chunks: Union[Sequence[int], str] = (8, 32),
                         num_bands: int = 5,
                         tile_items: Optional[int] = None,
                         compact_rows: Optional[bool] = None
                         ) -> SplitSpmvOperator:
    """Build the banded operator (see module docstring for when)."""
    return SplitSpmvOperator(csr, dtype=dtype, edges_chunks=edges_chunks,
                             num_bands=num_bands, tile_items=tile_items,
                             compact_rows=compact_rows)


_DEV_STAGES: dict = {}


def _dev_stages():
    """Module-singleton jitted stages for the device split builder.

    Defined once per process so repeat conversions of same-shaped
    matrices hit the jit cache — a per-call ``@jax.jit`` on a nested
    function is a FRESH cache every time, which made every build pay the
    full remote-compile cost again (~minutes through the axon tunnel;
    measured 296 s of which compiles were most, round 4)."""
    if _DEV_STAGES:
        return _DEV_STAGES
    import functools

    import jax
    import jax.numpy as jnp

    def row_ids(ends, nnz):
        return jnp.searchsorted(ends, jnp.arange(nnz, dtype=jnp.int32),
                                side="right").astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def dist(cols, ends, nnz):
        """Signed diagonal distances + their min/max (one pass)."""
        d = cols.astype(jnp.int32) - row_ids(ends, nnz)
        return d, jnp.min(d), jnp.max(d)

    @jax.jit
    def counts_below(d, probes):
        """#elements < probe, as chunked compare-reduce passes — replaces
        the full device sort (~10 s at 57M) for the quantile edges; a few
        hundred probes cost tens of milliseconds on the VPU.  Chunking
        keeps the (chunk, P) compare bounded even if a backend declines
        to fuse the broadcast (the full (nnz, P) intermediate would be
        tens of GB at 57M nnz on the CPU backend; ADVICE r4)."""
        chunk = 1 << 22
        nnz = d.shape[0]
        if nnz <= chunk:
            return (d[:, None] < probes[None, :]).sum(axis=0,
                                                      dtype=jnp.int32)
        nch = -(-nnz // chunk)
        # pad compares false for every legal probe (probes <= dmax + 1)
        dpad = jnp.pad(d, (0, nch * chunk - nnz),
                       constant_values=jnp.int32(2**31 - 1))
        d3 = dpad.reshape(nch, chunk)

        def body(c, acc):
            return acc + (d3[c][:, None] < probes[None, :]).sum(
                axis=0, dtype=jnp.int32)

        return jax.lax.fori_loop(
            0, nch, body, jnp.zeros((probes.shape[0],), jnp.int32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def order(d, edges_a, nb):
        band = jnp.searchsorted(edges_a, d, side="right").astype(jnp.int32)
        order_ = jnp.argsort(band, stable=True).astype(jnp.int32)
        seg = jnp.searchsorted(band[order_],
                               jnp.arange(nb, dtype=jnp.int32),
                               side="left")
        return band, order_, seg

    @functools.partial(jax.jit, static_argnums=(8, 9, 10))
    def stack(cols, vals, band, ends_orig, order_, seg_a, counts_a, dst_a,
              nb, total, m_pad):
        """Stacked arrays from DEVICE segment metadata.

        ``seg_a``/``counts_a``/``dst_a`` are device int32 arrays (band
        start in the sorted order, band nnz, band start in the stacked
        layout with dst_a[nb] == total); only ``nb``, ``total`` and
        ``m_pad`` are static, and the caller fixes ``total`` as a
        function of (nnz, nb, m_pad, tile_items) alone — so repeat
        conversions of same-shape matrices reuse this compile even when
        the band counts differ (ADVICE r4: per-matrix static tuples made
        the heaviest stage recompile on every new matrix)."""
        m = ends_orig.shape[0]
        cols_s = jnp.take(cols, order_).astype(jnp.int32)
        vals_s = jnp.take(vals, order_)
        ends32 = ends_orig.astype(jnp.int32)
        # one vectorized source-index pass replaces the per-band slices:
        # output j belongs to band b = bucket(dst_a, j); within-band
        # offset past the band's real nnz clamps to the last element
        # (cols pad = band's last column, keeping gather windows tight)
        # with the value zeroed
        j = jnp.arange(total, dtype=jnp.int32)
        b_of = (jnp.searchsorted(dst_a, j, side="right") - 1).astype(
            jnp.int32)
        o = j - jnp.take(dst_a, b_of)
        cnt_b = jnp.take(counts_a, b_of)
        src = jnp.take(seg_a, b_of) + jnp.minimum(
            o, jnp.maximum(cnt_b - 1, 0))
        cols_f = jnp.take(cols_s, src)
        vals_f = jnp.where(o < cnt_b, jnp.take(vals_s, src),
                           jnp.zeros((), vals.dtype))
        e_parts = []
        for b in range(nb):
            # band row-end offsets by cumsum-difference COUNTING over the
            # original row order — the per-band searchsorted this
            # replaces cost ~1 s/band at circuit5M scale (stage
            # attribution, round 4): per row r, the band-b count is
            # cs(end[r]-1) - cs(end[r-1]-1) with cs = running count of
            # band-b elements; int32 cumsum is exact
            cs = jnp.cumsum((band == b).astype(jnp.int32))
            at_end = jnp.take(cs, jnp.maximum(ends32 - 1, 0), axis=0)
            at_end = jnp.where(ends32 > 0, at_end, 0)
            eb = at_end + dst_a[b]
            eb = jnp.concatenate([
                eb, jnp.broadcast_to(dst_a[b] + counts_a[b],
                                     (m_pad - m,)).astype(jnp.int32)])
            eb = eb.at[m_pad - 1].set(dst_a[b + 1])  # pad nnz on last row
            e_parts.append(eb)
        ends_f = jnp.concatenate(e_parts).astype(jnp.int32)
        # per-1024-block column window extents (total ≡ 0 mod 1024 by the
        # stack invariant) — packed-table subchunk units (128 cols)
        cb = (cols_f >> 7).reshape(total // 1024, 1024)
        bmin = cb.min(axis=1)
        bmax = cb.max(axis=1)
        # row-window / row-span reductions (gather_plan.row_window_np /
        # row_span_np semantics, on device)
        rspan = (jnp.max(ends_f[1024:] - ends_f[:-1024])
                 if ends_f.shape[0] > 1024 else ends_f[-1])
        return cols_f, vals_f, ends_f, bmin, bmax, rspan

    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates
    tiles = functools.partial(jax.jit, static_argnums=(1, 2))(
        merge_tile_coordinates)

    _DEV_STAGES.update(dist=dist, counts_below=counts_below, order=order,
                       stack=stack, tiles=tiles)
    return _DEV_STAGES


def build_split_operator_device(csr: CsrMatrix, dtype="float32",
                                num_bands: int = 16,
                                tile_items: Optional[int] = None,
                                backend: str = "auto"
                                ) -> SplitSpmvOperator:
    """Device-side stacked-split setup (quantile edges).

    The host path (``SplitSpmvOperator.__init__``) pays several full
    passes over the nonzeros on the host — band searchsorted, stable
    argsort, per-band copies, then the plan probes — ~66 s at circuit5M
    scale on a fault-rate-limited host (BENCH_LARGE round 4).  The
    reference's comparison point converts to HYB **on the GPU** in ~1 s
    (gpu_spmv.cu:106-251, README.md:144), so setup belongs on the
    accelerator here too.  This builder uploads the ORIGINAL CSR arrays
    once and runs everything heavy on device:

      1. signed diagonal distances + equal-nnz quantile edges
         (device sort; only B-1 scalars come back);
      2. stable argsort by band id + boundary searchsorted
         (only B+1 segment offsets come back);
      3. the stacked arrays — per-band static-size slices concatenated
         with tile-aligned padding (nnz'_b ≡ -m_pad mod tile_items, the
         stack_bands invariant), stacked row-end offsets from per-band
         searchsorted over the band's (sorted) row ids, per-1024-block
         column min/max, the merge tile split, and the row-window /
         row-span reductions — only the small per-block/per-tile arrays
         come back for the plan arithmetic.

    The plan takes the device-computed ``r_win`` / ``x_win`` /
    ``row_span`` scalars (make_plan x_win override) and range-mode
    gather; prepare_csrmv then derives cbase on device as usual.  No
    host pass ever touches the nonzeros.  fp32 only (the circuit class).
    """
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import SpmvOperator
    from merge_spmv_tpu.ops.plan import make_plan

    assert dtype in ("float32",), "device split builder is fp32-only"
    stages = _dev_stages()
    t_start = time.perf_counter()
    m, n, nnz = csr.num_rows, csr.num_cols, csr.num_nonzeros
    B = int(num_bands)
    vals_d, ends_d, cols_d = csr.to_device(dtype=np.float32)
    jax.block_until_ready((vals_d, ends_d, cols_d))
    # upload attributed separately: the reference's HYB conversion also
    # starts from the device-resident CSR (gpu_spmv.cu:106-134)
    upload_ms = (time.perf_counter() - t_start) * 1e3

    stage_ms = {"upload": upload_ms}
    t_m = time.perf_counter()

    def _mark(name):
        nonlocal t_m
        stage_ms[name] = (time.perf_counter() - t_m) * 1e3
        t_m = time.perf_counter()

    # -- stage 1: quantile edges by iterative probe refinement ---------- #
    # No sort: each round issues one compare-reduce pass counting
    # elements below ~64 aligned probes per unresolved quantile, and
    # narrows each quantile's bracket 64x; 1024-column resolution is
    # reached in <= 3 rounds.  Quantile ranks as host ints (device int32
    # rank math would overflow at (B-1)*nnz for kron-scale nnz).
    d_dev, dmin_d, dmax_d = stages["dist"](cols_d, ends_d, nnz)
    dmin = int(jax.device_get(dmin_d))
    dmax = int(jax.device_get(dmax_d))
    targets = [int(b * nnz) // B for b in range(1, B)]
    lo = np.full(len(targets), dmin - 1, np.int64)      # count_below(lo) <= t
    hi = np.full(len(targets), dmax + 1, np.int64)      # count_below(hi) > t
    while True:
        probe_sets = []
        for k in range(len(targets)):
            width = hi[k] - lo[k]
            if width <= 1024:
                continue
            step = max(1024, (-(-width // 64) + 1023) // 1024 * 1024)
            probe_sets.append(np.arange(lo[k] + step, hi[k], step,
                                        dtype=np.int64))
        if not probe_sets:
            break
        probes = np.unique(np.concatenate(probe_sets)).astype(np.int32)
        cnts = np.asarray(jax.device_get(
            stages["counts_below"](d_dev, jnp.asarray(probes))), np.int64)
        for k, t_ in enumerate(targets):
            # tightest probe bracket around rank t_
            below = probes[cnts <= t_]
            above = probes[cnts > t_]
            if below.size:
                lo[k] = max(lo[k], int(below[-1]))
            if above.size:
                hi[k] = min(hi[k], int(above[0]))
    edges = np.unique((np.round(hi / 1024.0) * 1024).astype(np.int32))
    _mark("edges")
    nb = len(edges) + 1
    if nb == 1:
        from merge_spmv_tpu.ops.operator import build_operator
        base = build_operator(csr, dtype=dtype, tile_items=tile_items)
        return SplitSpmvOperator.from_stacked(
            base, 1, m, m, [nnz], (time.perf_counter() - t_start) * 1e3)

    # -- stage 2: stable sort by band, segment boundaries --------------- #
    band_d, order_d, seg_d = stages["order"](d_dev, jnp.asarray(edges), nb)
    seg = np.concatenate([np.asarray(jax.device_get(seg_d), np.int64),
                          [nnz]])
    jax.block_until_ready(order_d)
    del d_dev
    _mark("order")
    counts = np.diff(seg)

    m_pad = -(-m // 1024) * 1024
    if tile_items is None:
        tile_items = make_plan(nb * m_pad, n, nnz, dtype=dtype).tile_items
    assert tile_items % 1024 == 0
    pads = (-(m_pad + counts)) % tile_items
    dst = np.concatenate([[0], np.cumsum(counts + pads)]).astype(np.int64)
    # STATIC total: a function of (nnz, nb, m_pad, tile_items) only, so
    # the stack stage's compile is reused across same-shape matrices
    # regardless of where the band boundaries land (ADVICE r4).  Every
    # band's stacked nnz is ≡ -m_pad (mod tile_items), so the sum is
    # ≡ -nb*m_pad; extend the LAST band's pad to the smallest value of
    # that congruence class that covers the worst-case per-band padding.
    t0 = nnz + (nb + 1) * tile_items
    total = t0 - (t0 + nb * m_pad) % tile_items
    assert total >= int(dst[-1]) and (total - int(dst[-1])) % tile_items == 0
    pads[-1] += total - int(dst[-1])
    dst = np.concatenate([[0], np.cumsum(counts + pads)]).astype(np.int64)

    # -- stage 3: stacked arrays + plan reductions, all on device ------- #
    seg_a = jnp.asarray(seg[:-1], jnp.int32)   # band starts (sorted order)
    counts_a = jnp.asarray(counts, jnp.int32)
    dst_a = jnp.asarray(dst, jnp.int32)
    cols_f, vals_f, ends_f, bmin_d, bmax_d, rspan_d = stages["stack"](
        cols_d, vals_d, band_d, ends_d, order_d, seg_a, counts_a, dst_a,
        nb, total, m_pad)
    jax.block_until_ready(ends_f)
    _mark("stack")
    del cols_d, vals_d, band_d, order_d

    tile_x, tile_y = stages["tiles"](ends_f, total, tile_items)
    tile_rows = np.asarray(jax.device_get(tile_x), np.int64)
    tile_nnz = np.asarray(jax.device_get(tile_y), np.int64)
    bmin = np.asarray(jax.device_get(bmin_d), np.int64)
    bmax = np.asarray(jax.device_get(bmax_d), np.int64)
    rspan = int(jax.device_get(rspan_d))

    # r_win (row_window_np semantics)
    span_r = int((tile_rows[1:] - (tile_rows[:-1] // 1024) * 1024).max())
    r_win = max(1024, -(-span_r // 1024) * 1024)
    # row_span (row_span_np semantics)
    bpt = (tile_items + 1024) // 1024
    row_span = int(min(rspan // 1024 + 2, bpt))
    # x_win (tile_col_meta_np semantics over the device block extents):
    # per tile, min/max subchunk over its own block range, +8 slack for
    # the device coarse cbase fallback
    nblocks = len(bmin)
    b0 = np.minimum(tile_nnz[:-1] // 1024, nblocks - 1)
    b1 = np.clip(-(-tile_nnz[1:] // 1024), b0 + 1, nblocks)
    idx = np.empty(2 * len(b0), np.int64)
    idx[0::2] = b0
    idx[1::2] = b1
    bmin_e = np.concatenate([bmin, [2**31]])
    bmax_e = np.concatenate([bmax, [-2**31]])
    win_min = np.minimum.reduceat(bmin_e, idx)[0::2]
    win_max = np.maximum.reduceat(bmax_e, idx)[0::2]
    span = win_max - (win_min // 8) * 8 + 1
    num_sub = 8 * max(1, -(-n // 1024))
    x_win = min(int(-(-int(span.max()) // 8) * 8) + 8, num_sub)

    plan = make_plan(nb * m_pad, n, total, dtype=dtype, backend=backend,
                     tile_items=tile_items, r_win=r_win, x_win=x_win,
                     row_span=row_span)
    op = SpmvOperator(plan, vals_f, ends_f, cols_f)
    # setup_ms must mean "ready to serve": block on the prepared device
    # state (dispatches above are async; an unblocked timer reads the
    # enqueue cost, not the conversion cost the reference reports for
    # HYB, gpu_spmv.cu:114-134)
    if op._prep is not None:
        jax.block_until_ready((op._prep.values_p, op._prep.tile_rows))
    else:
        jax.block_until_ready((op.values, op.row_end_offsets))
    _mark("plan_prepare")
    sop = SplitSpmvOperator.from_stacked(
        op, nb, m_pad, m, counts.tolist(),
        (time.perf_counter() - t_start) * 1e3)
    sop.upload_ms = upload_ms
    sop.convert_ms = sop.setup_ms - upload_ms
    sop.stage_ms = {k: round(v, 1) for k, v in stage_ms.items()}
    return sop
