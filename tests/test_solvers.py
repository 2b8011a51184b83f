"""Solver-family tests (models/solvers.py) on the 8-device CPU sim mesh.

Each solver runs over a real SpmvOperator (XLA backend on CPU) and is
checked against NumPy linear algebra on the densified matrix.
"""

import numpy as np
import pytest

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.models.solvers import (bicgstab, conjugate_gradient,
                                           jacobi, pagerank, power_iteration)
from merge_spmv_tpu.ops.operator import build_operator


def _laplacian_csr(width=12):
    """SPD system: 2D grid Laplacian L = D - A (strictly diagonally
    dominant after +I regularization)."""
    coo = CooMatrix.grid2d(width)
    csr = CsrMatrix.from_coo(coo)
    dense = -csr.to_dense()
    deg = -dense.sum(axis=1)
    np.fill_diagonal(dense, deg + 1.0)
    rows, cols = np.nonzero(dense)
    coo2 = CooMatrix(dense.shape[0], dense.shape[1], rows.astype(np.int32),
                     cols.astype(np.int32), dense[rows, cols])
    return CsrMatrix.from_coo(coo2), dense


def test_conjugate_gradient_matches_solve():
    csr, dense = _laplacian_csr()
    op = build_operator(csr, dtype="float32")
    rs = np.random.RandomState(0)
    b = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    x, info = conjugate_gradient(op, b, tol=1e-6, maxiter=2000)
    want = np.linalg.solve(dense, b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-3)
    assert int(info.iterations) > 0


def test_bicgstab_nonsymmetric():
    rs = np.random.RandomState(1)
    n = 120
    dense = np.eye(n) * 8.0 + rs.uniform(-1, 1, (n, n)) * (rs.rand(n, n) < 0.05)
    rows, cols = np.nonzero(dense)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows.astype(np.int32),
                                       cols.astype(np.int32),
                                       dense[rows, cols]))
    op = build_operator(csr, dtype="float32")
    b = rs.uniform(-1, 1, n).astype(np.float32)
    x, info = bicgstab(op, b, tol=1e-6, maxiter=500)
    want = np.linalg.solve(dense, b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-3)


def test_jacobi_diagonally_dominant():
    csr, dense = _laplacian_csr(10)
    op = build_operator(csr, dtype="float32")
    rs = np.random.RandomState(2)
    b = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    diag = np.diag(dense).astype(np.float32)
    x, info = jacobi(op, diag, b, tol=1e-6, maxiter=5000)
    want = np.linalg.solve(dense, b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), want, rtol=5e-3, atol=5e-3)


def test_power_iteration_dominant_eigenvalue():
    rs = np.random.RandomState(3)
    n = 80
    m = rs.uniform(0, 1, (n, n)) * (rs.rand(n, n) < 0.2)
    dense = (m + m.T) / 2 + np.eye(n) * 0.1   # symmetric -> real spectrum
    rows, cols = np.nonzero(dense)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows.astype(np.int32),
                                       cols.astype(np.int32),
                                       dense[rows, cols]))
    op = build_operator(csr, dtype="float32")
    lam, v, info = power_iteration(op, tol=1e-9, maxiter=3000)
    want = np.max(np.abs(np.linalg.eigvalsh(dense)))
    assert abs(float(lam) - want) / want < 1e-3


def test_pagerank_sums_to_one_and_ranks_hub():
    # star graph: every page links to page 0 -> page 0 dominates
    n = 50
    rs = np.random.RandomState(4)
    src = np.arange(1, n, dtype=np.int32)
    dst = np.zeros(n - 1, dtype=np.int32)
    extra_src = rs.randint(1, n, 60).astype(np.int32)
    extra_dst = rs.randint(1, n, 60).astype(np.int32)
    src = np.concatenate([src, extra_src])
    dst = np.concatenate([dst, extra_dst])
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    vals = 1.0 / out_deg[src]
    # P[dst, src]: column-stochastic transition matrix
    csr = CsrMatrix.from_coo(CooMatrix(n, n, dst, src, vals))
    op = build_operator(csr, dtype="float32")
    pr, info = pagerank(op, tol=1e-10, maxiter=500)
    pr = np.asarray(pr)
    assert abs(pr.sum() - 1.0) < 1e-3
    assert pr.argmax() == 0


def test_conjugate_gradient_over_dia_operator():
    """The structured-path operators expose the same call surface, so the
    solver family composes with them unchanged (ops/dia.py)."""
    from merge_spmv_tpu.ops.dia import build_dia_operator
    csr, dense = _laplacian_csr(10)
    op = build_dia_operator(csr.astype(np.float32), dtype="float32")
    assert op.offsets.size == 5 and op.rest_op is None
    rs = np.random.RandomState(1)
    b = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    x, info = conjugate_gradient(op, b, tol=1e-6, maxiter=2000)
    want = np.linalg.solve(dense, b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-3)
    assert int(info.iterations) > 0
