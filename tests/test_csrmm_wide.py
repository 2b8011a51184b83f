"""Differential tests of the wide multi-RHS SpMM kernel vs the gold model.

The wide kernel lays RHS across sublanes and items/rows across lanes
(ops/csrmm_pallas.py); these cover the merge-path corner cases at several
k values plus the streamed-XT mode and the operator integration.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.csrmm_pallas import csrmm_wide, make_mm_plan
from merge_spmv_tpu.utils.compare import assert_allclose_ulp

INTERPRET = not os.environ.get("MERGE_SPMV_TEST_TPU")


def _run(coo, k, tile_items=2048, alpha=1.0, beta=0.0, with_y=False,
         seed=0, vmem_bytes=None):
    csr = CsrMatrix.from_coo(coo).astype(np.float32)
    rs = np.random.RandomState(seed)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    X = rs.uniform(0.1, 1, (csr.num_cols, k)).astype(np.float32)
    Y_in = (rs.uniform(0.1, 1, (csr.num_rows, k)).astype(np.float32)
            if with_y else None)
    plan = make_mm_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros, k,
                        row_end_offsets=csr.row_offsets[1:],
                        col_indices=csr.col_indices,
                        tile_items=tile_items, vmem_bytes=vmem_bytes)
    v, re_, ci = csr.to_device(dtype=np.float32)
    Y = csrmm_wide(plan, v, re_, ci, jnp.asarray(X),
                   Y_in=None if Y_in is None else jnp.asarray(Y_in),
                   alpha=alpha, beta=beta, interpret=INTERPRET)
    gold = csr.spmm_gold(X, Y_in, alpha=alpha, beta=beta)
    return np.asarray(Y), gold, plan


CASES = {
    "grid2d": (lambda: CooMatrix.grid2d(20), 8),
    "powerlaw_k16": (lambda: CooMatrix.random_powerlaw(800, 700, 6000,
                                                       seed=3), 16),
    "wheel_hub": (lambda: CooMatrix.wheel(3000), 8),
    "empty_rows": (lambda: CooMatrix(900, 64, rows=[5, 5, 850],
                                     cols=[0, 63, 3],
                                     vals=[1., 2., 3.]), 8),
    "duplicates": (lambda: CooMatrix(4, 4, rows=[1, 1, 1], cols=[2, 2, 2],
                                     vals=[1., 2., 3.]), 8),
    "k_not_multiple_of_8": (lambda: CooMatrix.grid2d(12), 5),
    "k64": (lambda: CooMatrix.random_uniform(300, 280, 6, seed=4), 64),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_csrmm_wide_vs_gold(name):
    gen, k = CASES[name]
    got, want, _ = _run(gen(), k)
    assert_allclose_ulp(got, want, context=name)


def test_alpha_beta_epilogue():
    got, want, _ = _run(CASES["powerlaw_k16"][0](), 16, alpha=2.5,
                        beta=0.5, with_y=True)
    assert_allclose_ulp(got, want, context="mm_alpha_beta")


def test_streamed_xt_windows():
    """XT larger than the (test-shrunk) VMEM budget streams per-tile
    column windows, same cbase machinery as csrmv."""
    rs = np.random.RandomState(11)
    n = 20000
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows + rs.randint(-300, 300, rows.size), 0, n - 1)
    coo = CooMatrix(n, n, rows.astype(np.int32), cols.astype(np.int32),
                    rs.uniform(0.1, 1, rows.size))
    got, want, plan = _run(coo, 8, tile_items=2048,
                           vmem_bytes=1 * 1024 * 1024)
    assert plan.x_win > 0, plan.describe()
    assert_allclose_ulp(got, want, context="mm_streamed")


def test_operator_mm_routes_wide():
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES["powerlaw_k16"][0]()).astype(np.float32)
    rs = np.random.RandomState(5)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    X = rs.uniform(0.1, 1, (csr.num_cols, 16)).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas")
    Y = op.mm(jnp.asarray(X), interpret=INTERPRET, method="wide")
    assert hasattr(op, "_mm_cache") and len(op._mm_cache) == 1
    assert_allclose_ulp(np.asarray(Y), csr.spmm_gold(X),
                        context="operator_mm")


def test_operator_mm_wide_explicit_request_errors():
    """An explicit method='wide' on an operator without a wide path must
    raise, never silently run something else (round-2 verdict: a
    pallas_ds operator fell through to the column loop with no signal)."""
    import pytest

    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES["powerlaw_k16"][0]()).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="xla")
    X = np.ones((csr.num_cols, 8), np.float32)
    with pytest.raises(ValueError, match="wide"):
        op.mm(jnp.asarray(X), interpret=INTERPRET, method="wide")
    op2 = build_operator(csr, dtype="float32", backend="pallas")
    with pytest.raises(ValueError, match="k >= 2"):
        op2.mm(jnp.asarray(X[:, :1]), interpret=INTERPRET, method="wide")
