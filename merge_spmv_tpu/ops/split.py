"""Prepare-time matrix splitting for scattered-column matrices (opt-in).

The merge kernel's gather cost is proportional to the number of distinct
1024-column chunks each 1024-nonzero block touches (ops/gather_plan.py).
A matrix whose columns scatter over a wide range around the diagonal
(circuit/graph classes) forces O(range/1024) chunk visits per block — the
cost is matrix-intrinsic under the no-preprocessing contract.

This module trades one-time setup for per-call speed: the nonzeros are
split by signed diagonal distance into geometric bands, each band a valid
CSR over the SAME rows (empty rows are native to merge-path, so band
matrices need no row remapping).  Each band's blocks then span only the
band's width, collapsing the per-block chunk-visit count; the band results
chain through the kernel's beta-accumulation epilogue.

This is the TPU analog of the reference's cuSPARSE HybMV comparison point:
an ELL+COO *format split* whose setup time is measured and reported
separately from the multiply (gpu_spmv.cu:106-251, README.md:143-144 —
1059.8 ms setup for circuit5M).  The default operator remains strictly
no-preprocessing (README.md:5-7); `SplitSpmvOperator` is the documented
opt-in for scatter-heavy matrices, with `setup_ms` exposed.

Measured (circuit5M-class synthetic, 5.56M rows, 56.7M nnz, Laplace
+-64K-clipped columns, v5e): single-matrix merge kernel 214 ms -> banded
split 5 bands ~40-60 ms at ~2 s setup.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

from merge_spmv_tpu.formats.csr import CsrMatrix

__all__ = ["split_by_distance", "SplitSpmvOperator", "build_split_operator"]


def _row_ids(csr: CsrMatrix) -> np.ndarray:
    lens = np.diff(csr.row_offsets).astype(np.int64)
    return np.repeat(np.arange(csr.num_rows, dtype=np.int64), lens)


def _subset_csr(csr: CsrMatrix, mask: np.ndarray,
                row_ids: np.ndarray) -> CsrMatrix:
    """CSR holding only the masked nonzeros; same shape, same rows.

    The mask preserves CSR order, so the subset stays row-sorted; rows
    losing all their entries become empty rows (row_offsets[r] ==
    row_offsets[r+1]), which the merge path consumes natively
    (sparse_matrix.h:707-727 empty-row backfill semantics)."""
    sel_rows = row_ids[mask]
    counts = np.bincount(sel_rows, minlength=csr.num_rows)
    row_offsets = np.zeros(csr.num_rows + 1, dtype=csr.row_offsets.dtype)
    np.cumsum(counts, out=row_offsets[1:])
    return CsrMatrix(csr.num_rows, csr.num_cols, row_offsets,
                     np.ascontiguousarray(csr.col_indices[mask]),
                     np.ascontiguousarray(csr.values[mask]))


def split_by_distance(csr: CsrMatrix,
                      edges_chunks: Sequence[int] = (8, 32),
                      min_frac: float = 0.02):
    """Split by signed diagonal distance into geometric bands.

    ``edges_chunks`` are positive band edges in 1024-column chunks; the
    signed edge list becomes [-inf, -e_n..., -e_1, e_1, ..., e_n, inf].
    Bands holding less than ``min_frac`` of the nonzeros are merged into
    their inner neighbor (they would pay per-band fixed costs for nothing).

    Returns (bands, band_ids) where bands is a list of CsrMatrix.
    """
    row_ids = _row_ids(csr)
    d = csr.col_indices.astype(np.int64) - row_ids
    edges = np.array(sorted({int(e) * 1024 for e in edges_chunks if e > 0}),
                     dtype=np.int64)
    signed_edges = np.concatenate([-edges[::-1], edges])
    band = np.digitize(d, signed_edges)           # 0 .. len(signed_edges)
    nbands = len(signed_edges) + 1
    counts = np.bincount(band, minlength=nbands)
    # merge sub-threshold bands inward (towards the diagonal band)
    mid = len(edges)                              # index of the |d|<e_1 band
    remap = np.arange(nbands)
    for b in range(nbands):
        if counts[b] and counts[b] < min_frac * csr.num_nonzeros:
            step = 1 if b < mid else -1
            t = b
            while t != mid and (counts[t] < min_frac * csr.num_nonzeros
                                or t == b):
                t += step
            remap[b] = t
    band = remap[band]
    bands = []
    for b in np.unique(band):
        bands.append(_subset_csr(csr, band == b, row_ids))
    return bands, band


class SplitSpmvOperator:
    """Banded SpMV: one SpmvOperator per band, chained by beta=1 carries.

    y = alpha * (sum_b A_b) @ x + beta * y_in is computed as
    y_0 = alpha*A_0@x + beta*y_in;  y_b = alpha*A_b@x + y_{b-1}.

    ``setup_ms`` records the split + per-band prepare cost — report it the
    way the reference reports HYB conversion time (gpu_spmv.cu:114-134).
    """

    def __init__(self, csr: CsrMatrix, dtype="float32",
                 edges_chunks: Sequence[int] = (8, 32),
                 tile_items: Optional[int] = None):
        from merge_spmv_tpu.ops.operator import build_operator

        t0 = time.perf_counter()
        bands, _ = split_by_distance(csr, edges_chunks=edges_chunks)
        self.bands = bands
        self.ops = [build_operator(b, dtype=dtype, tile_items=tile_items)
                    for b in bands]
        self.plan = self.ops[0].plan if self.ops else None
        self.setup_ms = (time.perf_counter() - t0) * 1e3
        self.num_bands = len(self.ops)

    def __call__(self, x, y_in=None, alpha=1.0, beta=0.0,
                 interpret: bool = False):
        y = self.ops[0](x, y_in=y_in, alpha=alpha, beta=beta,
                        interpret=interpret)
        for op in self.ops[1:]:
            y = op(x, y_in=y, alpha=alpha, beta=1.0, interpret=interpret)
        return y

    def mm(self, X, Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
           method: str = "auto"):
        Y = self.ops[0].mm(X, Y_in=Y_in, alpha=alpha, beta=beta,
                           interpret=interpret, method=method)
        for op in self.ops[1:]:
            Y = op.mm(X, Y_in=Y, alpha=alpha, beta=1.0,
                      interpret=interpret, method=method)
        return Y

    def describe(self) -> str:
        parts = ", ".join(f"{b.num_nonzeros}" for b in self.bands)
        return (f"SplitSpmvOperator({self.num_bands} bands, nnz=[{parts}], "
                f"setup={self.setup_ms:.0f} ms)")


def build_split_operator(csr: CsrMatrix, dtype="float32",
                         edges_chunks: Sequence[int] = (8, 32),
                         tile_items: Optional[int] = None
                         ) -> SplitSpmvOperator:
    """Build the banded operator (see module docstring for when)."""
    return SplitSpmvOperator(csr, dtype=dtype, edges_chunks=edges_chunks,
                             tile_items=tile_items)
