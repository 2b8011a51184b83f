"""Diagonal (DIA) split operator — the structured-matrix fast path.

Stencil matrices (grid2d/grid3d Laplacians, banded FEM with exact
offsets) concentrate their nonzeros on a handful of diagonals.  The
merge kernel must still *discover* that structure per block through its
gather machinery; a DIA layout needs none of it: for each stored
diagonal d, ``y += v_d * x[r + d]`` is a pure element-wise
multiply-add over a statically shifted x — no indices read, no gather,
no merge bookkeeping.  On a TPU that is the shape the VPU and XLA's
fusion were built for: D fused multiply-adds streaming at HBM rate.

Prepare time histograms the column-row offsets; if the top ``max_diags``
diagonals cover at least ``min_coverage`` of the nonzeros, those
diagonals are densified into a (D, m) table and the leftover nonzeros
(if any) chain through a standard merge-path CSR operator.  Otherwise
the split DECLINES (returns hot set empty) — scattered matrices stay on
the merge path / banded split.

This is the TPU analog of the reference's cuSPARSE HybMV comparison
point: an ELL+COO format split whose conversion time is reported
separately from the multiply (gpu_spmv.cu:106-251, README.md:143-144 —
1059.8 ms setup, then 8.64 ms/call on circuit5M).  Like HYB it is a
documented OPT-IN that trades setup for per-call speed; the default
operator remains strictly no-preprocessing (README.md:5-7).  Unlike HYB
the dense part is diagonal- rather than row-oriented, because the TPU's
win condition is contiguous vector streams, not warp-uniform row loads.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from merge_spmv_tpu.formats.csr import CsrMatrix

from merge_spmv_tpu.ops.split import _row_ids, _subset_csr

__all__ = ["diagonal_assignment", "DiaSpmvOperator", "build_dia_operator"]

# offset histogram cap: a true-DIA matrix has a tiny offset range; a
# range beyond this is scatter, not structure (the bincount below would
# also allocate range*8 bytes)
_RANGE_CAP = 1 << 24


def diagonal_assignment(csr: CsrMatrix, max_diags: int = 32,
                        min_coverage: float = 0.5,
                        dense_frac: float = 0.2,
                        row_ids: Optional[np.ndarray] = None):
    """Pick the dense diagonals.

    A diagonal is worth densifying when it holds at least ``dense_frac``
    of its full length in nonzeros (a (D, m) band costs m values to
    store and stream regardless of fill; below ~1/3 fill the CSR bytes
    are cheaper, and sparse bands waste the multiply).  The densest
    ``max_diags`` such diagonals are taken; if together they cover less
    than ``min_coverage`` of the nonzeros the split DECLINES — this is
    scatter, not structure.

    Returns ``(offsets, diag_mask)``: chosen signed offsets (ascending,
    int64) and the per-nonzero bool mask of entries on them.
    """
    if csr.num_nonzeros == 0:
        return np.empty(0, np.int64), np.zeros(0, bool)
    if row_ids is None:
        row_ids = _row_ids(csr)
    d = csr.col_indices.astype(np.int64, copy=False) - row_ids
    dmin, dmax = int(d.min()), int(d.max())
    if dmax - dmin >= _RANGE_CAP:
        return np.empty(0, np.int64), np.zeros(csr.num_nonzeros, bool)
    cnt = np.bincount((d - dmin).astype(np.int64),
                      minlength=dmax - dmin + 1)
    # full length of diagonal at offset o within the m x n rectangle
    offs_all = np.arange(dmin, dmax + 1)
    dlen = (np.minimum(csr.num_rows, csr.num_cols - offs_all)
            - np.maximum(0, -offs_all)).clip(1)
    dense = np.flatnonzero(cnt >= dense_frac * dlen)
    if dense.size > max_diags:
        dense = dense[np.argsort(cnt[dense])[::-1][:max_diags]]
    covered = int(cnt[dense].sum())
    if dense.size == 0 or covered < min_coverage * csr.num_nonzeros:
        return np.empty(0, np.int64), np.zeros(csr.num_nonzeros, bool)
    offsets = np.sort(dense) + dmin
    keep = np.zeros(dmax - dmin + 1, bool)
    keep[offsets - dmin] = True
    return offsets.astype(np.int64), keep[(d - dmin).astype(np.int64)]


class DiaSpmvOperator:
    """Dominant diagonals densified, leftover through the merge path.

    y = alpha*A@x + beta*y_in runs as D statically-shifted fused
    multiply-adds over a zero-padded x (one jit, XLA fuses the D passes)
    plus, when the matrix is not purely diagonal, a chained merge-path
    launch over the leftover CSR.  ``setup_ms`` reports the conversion
    cost the way the reference reports HYB setup (gpu_spmv.cu:114-134).
    """

    def __init__(self, csr: CsrMatrix, dtype="float32",
                 max_diags: int = 32, min_coverage: float = 0.5,
                 tile_items: Optional[int] = None, backend: str = "auto"):
        import jax.numpy as jnp

        t0 = time.perf_counter()
        row_ids = _row_ids(csr)
        offsets, mask = diagonal_assignment(csr, max_diags=max_diags,
                                            min_coverage=min_coverage,
                                            row_ids=row_ids)
        self.num_rows = m = csr.num_rows
        self.num_cols = csr.num_cols
        self.offsets = offsets
        self.dia_nnz = int(mask.sum())
        self.rest_nnz = csr.num_nonzeros - self.dia_nnz
        self.vtab = None
        self.rest_op = None
        jdt = jnp.dtype(dtype)
        if offsets.size:
            d = csr.col_indices.astype(np.int64, copy=False) - row_ids
            # one bucketing pass: flat (diag_rank, row) bincount sums
            # duplicates with the same semantics as the CSR gold (a
            # per-diagonal mask loop would scan all nonzeros D times)
            rank = np.searchsorted(offsets, d[mask])
            flat = rank * m + row_ids[mask]
            vtab = np.bincount(
                flat, weights=csr.values[mask].astype(np.float64),
                minlength=offsets.size * m).reshape(offsets.size, m)
            self.vtab = jnp.asarray(vtab.astype(jdt))
            # x is padded so x_pad[r + off - offsets.min() ... ] is always
            # in bounds: left pad max(0, -min_off), right pad to cover
            # r + max_off up to m-1+max_off over an n-length x
            self._lpad = int(max(0, -int(offsets.min())))
            self._rpad = int(max(0, m - 1 + int(offsets.max())
                                 - (csr.num_cols - 1)))
        if self.rest_nnz or not offsets.size:
            from merge_spmv_tpu.ops.operator import build_operator
            # declined ⇒ the original CSR is the rest; no copy
            rest = (_subset_csr(csr, ~mask, row_ids) if offsets.size
                    else csr)
            self.rest_op = build_operator(rest, dtype=dtype,
                                          tile_items=tile_items,
                                          backend=backend)
        self.plan = (self.rest_op.plan if self.rest_op is not None
                     else None)
        # pallas DIA matvec gate (ops/dia_pallas.py): fp32 table, staged
        # x + double-buffered vtab tiles within the VMEM budget.  The
        # XLA serial chain stays as the fallback (it lowers to D
        # separate passes — measured 3-5x the minimal traffic, round 4).
        self._pallas_ok = False
        if self.vtab is not None and jdt == jnp.float32:
            from merge_spmv_tpu.ops.dia_pallas import dia_pallas_fits
            # gate on the kernel's FULL working set (staged x at the
            # padded length + double-buffered vtab and output tiles),
            # not just the x bytes — D-wide tables on ~2M-column inputs
            # previously passed an x-only gate and died in Mosaic with
            # VMEM exhaustion (ADVICE r4, medium)
            offs = tuple(int(o) for o in self.offsets)
            self._pallas_ok = (self.offsets.size <= 16
                               and dia_pallas_fits(m, offs))
        self.setup_ms = (time.perf_counter() - t0) * 1e3

    def _dia_matvec(self, xv, interpret: bool = False):
        """The diagonal part's matvec: pallas kernel when gated on (TPU
        or interpret mode), XLA serial chain otherwise."""
        import jax
        import jax.numpy as jnp
        use_pallas = self._pallas_ok and (
            interpret or jax.default_backend() == "tpu")
        if use_pallas:
            from merge_spmv_tpu.ops.dia_pallas import dia_matvec_pallas
            return dia_matvec_pallas(
                self.vtab, xv, tuple(int(o) for o in self.offsets),
                self.num_rows, self.num_cols, interpret=interpret)
        xp = jnp.pad(xv, (self._lpad, self._rpad))
        m = self.num_rows
        acc = jnp.zeros((m,), self.vtab.dtype)
        for i, off in enumerate(self.offsets):
            s = self._lpad + int(off)
            acc = acc + self.vtab[i] * xp[s:s + m]
        return acc

    def __call__(self, x, y_in=None, alpha=1.0, beta=0.0,
                 interpret: bool = False):
        import jax.numpy as jnp
        y = None
        if self.vtab is not None:
            xv = jnp.asarray(x).astype(self.vtab.dtype)
            acc = self._dia_matvec(xv, interpret=interpret)
            y = acc if alpha == 1.0 else jnp.asarray(alpha,
                                                     acc.dtype) * acc
        if self.rest_op is not None:
            y = self.rest_op(x, y_in=y, alpha=alpha,
                             beta=0.0 if y is None else 1.0,
                             interpret=interpret)
        if y_in is not None:
            y = y + jnp.asarray(beta, y.dtype) * y_in
        return y

    def mm(self, X, Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
           method: str = "auto"):
        import jax.numpy as jnp
        Y = None
        if self.vtab is not None:
            Xv = jnp.asarray(X).astype(self.vtab.dtype)
            Xp = jnp.pad(Xv, ((self._lpad, self._rpad), (0, 0)))
            m = self.num_rows
            acc = jnp.zeros((m, Xv.shape[1]), self.vtab.dtype)
            for i, off in enumerate(self.offsets):
                s = self._lpad + int(off)
                acc = acc + self.vtab[i][:, None] * Xp[s:s + m]
            Y = acc if alpha == 1.0 else jnp.asarray(alpha,
                                                     acc.dtype) * acc
        if self.rest_op is not None:
            Y = self.rest_op.mm(X, Y_in=Y, alpha=alpha,
                                beta=0.0 if Y is None else 1.0,
                                interpret=interpret, method=method)
        if Y_in is not None:
            Y = Y + jnp.asarray(beta, Y.dtype) * Y_in
        return Y

    def describe(self) -> str:
        dia = (f"{self.offsets.size} diagonals, nnz {self.dia_nnz}"
               if self.offsets.size else "no diagonal structure")
        return (f"DiaSpmvOperator({dia} / rest nnz {self.rest_nnz}, "
                f"setup={self.setup_ms:.0f} ms)")


def build_dia_operator(csr: CsrMatrix, dtype="float32",
                       max_diags: int = 32, min_coverage: float = 0.5,
                       tile_items: Optional[int] = None,
                       backend: str = "auto") -> DiaSpmvOperator:
    """Build the DIA split operator (see class docs for when)."""
    return DiaSpmvOperator(csr, dtype=dtype, max_diags=max_diags,
                           min_coverage=min_coverage,
                           tile_items=tile_items, backend=backend)
