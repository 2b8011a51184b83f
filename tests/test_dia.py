"""DIA split operator: structure detection + differential correctness.

The DIA path (ops/dia.py) densifies dominant diagonals — the structured
fast path the TPU's vector units reward — and chains any leftover
nonzeros through the merge operator.  These tests check the detector
takes exactly the stencil diagonals, declines on scatter, and that the
operator reproduces the gold SpMV/SpMM with the full alpha/beta
epilogue.
"""

import numpy as np

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.dia import build_dia_operator, diagonal_assignment
from merge_spmv_tpu.utils.compare import compare_results


def test_diagonal_assignment_grid3d_exact():
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(12)).astype(np.float32)
    offsets, mask = diagonal_assignment(csr, min_coverage=0.95)
    # grid3d adjacency (no self loops): ±1, ±w, ±w²
    assert set(offsets.tolist()) == {-144, -12, -1, 1, 12, 144}
    assert mask.all()


def test_diagonal_assignment_declines_on_scatter():
    n, deg = 6000, 9
    rs = np.random.RandomState(4)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rs.randint(0, n, rows.size)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(-1, 1, rows.size))
                             ).astype(np.float32)
    offsets, mask = diagonal_assignment(csr)
    assert offsets.size == 0
    assert not mask.any()


def test_dia_operator_pure_stencil_matches_gold():
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(10)).astype(np.float32)
    import jax.numpy as jnp
    op = build_dia_operator(csr, dtype="float32")
    assert op.offsets.size == 6 and op.rest_nnz == 0
    assert op.rest_op is None
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y0 = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    y = op(jnp.asarray(x), y_in=jnp.asarray(y0), alpha=1.5, beta=-0.5)
    gold = csr.spmv_gold(x, y0, alpha=1.5, beta=-0.5)
    bound = csr.spmv_abs_bound(x, y0, alpha=1.5, beta=-0.5)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def test_dia_operator_mixed_matches_gold():
    # stencil plus a sprinkle of scattered entries: leftover CSR chains
    base = CooMatrix.grid2d(40)
    rs = np.random.RandomState(2)
    extra = 300
    r_ = np.concatenate([base.rows, rs.randint(0, 1600, extra)])
    c_ = np.concatenate([base.cols, rs.randint(0, 1600, extra)])
    v_ = np.concatenate([base.vals, rs.uniform(-1, 1, extra)])
    csr = CsrMatrix.from_coo(CooMatrix(1600, 1600, r_, c_, v_)
                             ).astype(np.float32)
    import jax.numpy as jnp
    op = build_dia_operator(csr, dtype="float32", min_coverage=0.5)
    assert op.offsets.size >= 4 and op.rest_nnz > 0
    assert op.rest_op is not None
    rs2 = np.random.RandomState(1)
    x = rs2.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y = op(jnp.asarray(x), interpret=True)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def test_dia_operator_mm_matches_gold():
    csr = CsrMatrix.from_coo(CooMatrix.grid2d(30)).astype(np.float32)
    import jax.numpy as jnp
    op = build_dia_operator(csr, dtype="float32")
    rs = np.random.RandomState(1)
    X = rs.uniform(-1, 1, (csr.num_cols, 3)).astype(np.float32)
    Y = op.mm(jnp.asarray(X))
    gold = csr.spmm_gold(X)
    err = np.max(np.abs(np.asarray(Y) - gold))
    scale = np.max(np.abs(gold)) + 1e-9
    assert err / scale < 1e-5


def test_dia_operator_duplicates_summed():
    # duplicate (row, col) entries must sum, matching CSR gold semantics
    rows = np.array([0, 0, 1, 2, 2, 2], np.int64)
    cols = np.array([0, 0, 1, 2, 2, 0], np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    csr = CsrMatrix.from_coo(CooMatrix(3, 3, rows, cols, vals)
                             ).astype(np.float32)
    import jax.numpy as jnp
    op = build_dia_operator(csr, dtype="float32", min_coverage=0.3)
    x = np.array([1.0, 10.0, 100.0], np.float32)
    y = op(jnp.asarray(x), interpret=True)
    gold = csr.spmv_gold(x)
    assert np.allclose(np.asarray(y), gold, rtol=1e-6)


def test_dia_operator_rectangular():
    # m != n with off-diagonals: padding/shift math must stay in bounds
    m, n = 300, 400
    rows = np.concatenate([np.arange(m), np.arange(m)]).astype(np.int64)
    cols = np.concatenate([np.arange(m), np.arange(m) + 50]).astype(np.int64)
    vals = np.random.RandomState(0).uniform(-1, 1, 2 * m)
    csr = CsrMatrix.from_coo(CooMatrix(m, n, rows, cols, vals)
                             ).astype(np.float32)
    import jax.numpy as jnp
    op = build_dia_operator(csr, dtype="float32")
    assert set(op.offsets.tolist()) == {0, 50} and op.rest_op is None
    x = np.random.RandomState(1).uniform(-1, 1, n).astype(np.float32)
    y = op(jnp.asarray(x))
    gold = csr.spmv_gold(x)
    assert np.allclose(np.asarray(y), gold, rtol=1e-5, atol=1e-6)


def test_dia_operator_fp64():
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp
        csr = CsrMatrix.from_coo(CooMatrix.grid2d(20)).astype(np.float64)
        op = build_dia_operator(csr, dtype="float64")
        assert op.vtab.dtype == jnp.float64
        x = np.random.RandomState(2).uniform(-1, 1, csr.num_cols)
        y = op(jnp.asarray(x))
        gold = csr.spmv_gold(x)
        np.testing.assert_allclose(np.asarray(y), gold, rtol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dia_pallas_matvec_matches_gold_interpret():
    """The pallas DIA kernel (ops/dia_pallas.py): staged-x sublane reads
    + static lane concat must reproduce the gold for stencil offsets,
    including negative offsets, boundary rows, and a non-128-multiple
    row count."""
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.dia_pallas import dia_matvec_pallas

    for grid, kind in ((17, "grid3d"), (37, "grid2d")):
        coo = (CooMatrix.grid3d(grid) if kind == "grid3d"
               else CooMatrix.grid2d(grid))
        csr = CsrMatrix.from_coo(coo).astype(np.float32)
        rs = np.random.RandomState(1)
        csr.values = rs.uniform(-1, 1, csr.num_nonzeros).astype(np.float32)
        op = build_dia_operator(csr, dtype="float32")
        assert op.vtab is not None and op.rest_op is None
        x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
        y = dia_matvec_pallas(op.vtab, jnp.asarray(x),
                              tuple(int(o) for o in op.offsets),
                              op.num_rows, op.num_cols, interpret=True)
        gold = csr.spmv_gold(x)
        bound = csr.spmv_abs_bound(x)
        assert compare_results(np.asarray(y), gold,
                               abs_bound=bound) is None, kind


def test_dia_operator_interpret_routes_pallas():
    """op(x, interpret=True) drives the pallas matvec when gated on."""
    import jax.numpy as jnp

    csr = CsrMatrix.from_coo(CooMatrix.grid3d(12)).astype(np.float32)
    op = build_dia_operator(csr, dtype="float32")
    assert op._pallas_ok
    rs = np.random.RandomState(3)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y = op(jnp.asarray(x), interpret=True)
    gold = csr.spmv_gold(x)
    assert compare_results(np.asarray(y), gold,
                           abs_bound=csr.spmv_abs_bound(x)) is None
