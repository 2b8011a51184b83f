"""Differential tests of the XLA segment-sum backend against the gold model
(the pattern of cpu_spmv.cpp:380-387: verify before timing)."""

import numpy as np
import pytest
import jax.numpy as jnp

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.csrmv import csrmv, csrmm, make_plan
from merge_spmv_tpu.utils.compare import assert_allclose_ulp


def _device_arrays(csr, dtype):
    return (jnp.asarray(csr.values.astype(dtype)),
            jnp.asarray(csr.row_end_offsets),
            jnp.asarray(csr.col_indices))


MATRICES = {
    "grid2d": lambda: CooMatrix.grid2d(12),
    "grid3d": lambda: CooMatrix.grid3d(5),
    "wheel": lambda: CooMatrix.wheel(200),
    "dense": lambda: CooMatrix.dense(16, 24),
    "powerlaw": lambda: CooMatrix.random_powerlaw(300, 250, 3000, seed=4),
    "empty_rows": lambda: CooMatrix(7, 5, rows=[2, 2, 5], cols=[0, 4, 3],
                                    vals=[1., 2., 3.]),
    "duplicates": lambda: CooMatrix(3, 3, rows=[0, 0, 0], cols=[1, 1, 1],
                                    vals=[1., 2., 3.]),
    "one_col": lambda: CooMatrix(6, 1, rows=[0, 2, 2, 5], cols=[0, 0, 0, 0],
                                 vals=[1., 2., 3., 4.]),
}


@pytest.mark.parametrize("name", sorted(MATRICES))
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_csrmv_xla_vs_gold(name, dtype, rng):
    import contextlib

    import jax
    # fp64 runs under a local x64 scope so the differential test is real
    # (previously skipped whenever the suite ran with x64 off)
    ctx = (jax.enable_x64(True) if dtype == np.float64
           else contextlib.nullcontext())
    with ctx:
        csr = CsrMatrix.from_coo(MATRICES[name]())
        x = rng.uniform(-1, 1, csr.num_cols).astype(dtype)
        want = csr.astype(dtype).spmv_gold(x)
        plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                         dtype=dtype, backend="xla")
        got = csrmv(plan, *_device_arrays(csr, dtype), jnp.asarray(x))
        assert np.asarray(got).dtype == dtype
        assert_allclose_ulp(np.asarray(got), want, context=name)


def test_alpha_beta_epilogue(rng):
    csr = CsrMatrix.from_coo(MATRICES["powerlaw"]())
    x = rng.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y_in = rng.uniform(-1, 1, csr.num_rows).astype(np.float32)
    want = csr.astype(np.float32).spmv_gold(x, y_in, alpha=2.5, beta=-0.5)
    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype=np.float32, backend="xla")
    got = csrmv(plan, *_device_arrays(csr, np.float32), jnp.asarray(x),
                y_in=jnp.asarray(y_in), alpha=2.5, beta=-0.5)
    assert_allclose_ulp(np.asarray(got), want, context="alpha_beta")


def test_csrmm_vs_gold(rng):
    csr = CsrMatrix.from_coo(MATRICES["powerlaw"]())
    X = rng.uniform(-1, 1, (csr.num_cols, 8)).astype(np.float32)
    want = csr.astype(np.float32).spmm_gold(X)
    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype=np.float32, backend="xla", num_rhs=8)
    got = csrmm(plan, *_device_arrays(csr, np.float32), jnp.asarray(X))
    assert_allclose_ulp(np.asarray(got), want, context="csrmm")


def test_plan_is_cached_jit_key():
    csr = CsrMatrix.from_coo(MATRICES["grid2d"]())
    p1 = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                   dtype=np.float32, backend="xla")
    p2 = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                   dtype=np.float32, backend="xla")
    assert p1 == p2 and hash(p1) == hash(p2)


def test_empty_matrix():
    csr = CsrMatrix(3, 3, [0, 0, 0, 0], [], np.zeros(0, np.float32))
    plan = make_plan(3, 3, 0, dtype=np.float32, backend="xla")
    got = csrmv(plan, jnp.zeros(0, jnp.float32),
                jnp.asarray(csr.row_end_offsets),
                jnp.zeros(0, jnp.int32), jnp.ones(3, jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), np.zeros(3))


def test_bf16_operator_end_to_end():
    """bfloat16 values flow through the plan ladder and operator (fp32
    accumulate inside; the TPU plan keys bf16 like fp32, plan.py:178)."""
    import ml_dtypes
    import jax.numpy as jnp
    import numpy as np

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CooMatrix.grid2d(30))
    op = build_operator(csr.astype(ml_dtypes.bfloat16), dtype="bfloat16")
    x = jnp.ones((csr.num_cols,), jnp.bfloat16)
    y = op(x, interpret=True)
    assert y.dtype == jnp.bfloat16
    gold = csr.astype(np.float32).spmv_gold(
        np.ones(csr.num_cols, np.float32))
    # integer-valued stencil sums are exactly representable in bf16
    assert np.max(np.abs(np.asarray(y, np.float32) - gold)) == 0.0


def test_sorted_segment_sum_matches_segment_sum():
    """The scatter-free large-nnz path must agree with the scatter form
    (and gold) on skewed rows, empty rows, and a non-1024-multiple nnz."""
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.csrmv_xla import _sorted_segment_sum
    from merge_spmv_tpu.utils.compare import compare_results

    rs = np.random.RandomState(9)
    n = 3000
    raw = rs.pareto(1.3, n) + 1.0
    deg = np.maximum(0, (raw * (12 * n / raw.sum())).astype(np.int64))
    deg[::7] = 0   # empty rows
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rs.randint(0, n, rows.size)
    vals = rs.uniform(-1, 1, rows.size)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                             ).astype(np.float32)
    x = rs.uniform(-1, 1, n).astype(np.float32)
    products = csr.values * x[csr.col_indices]
    got = np.asarray(_sorted_segment_sum(
        jnp.asarray(products), jnp.asarray(csr.row_offsets[1:]
                                           ).astype(jnp.int32)))
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    assert got.shape == gold.shape
    assert compare_results(got, gold, abs_bound=bound) is None


def test_sorted_segment_sum_compensated_prefix():
    """The >cap scatter-free route must not quantize row values at
    ULP(|global prefix|): signed products drive the running prefix to
    ~sqrt(nnz) while small rows straddle block boundaries (the round-5
    wb-edu-class verify failure).  The compensated (hi, lo) block
    prefix keeps endpoint DIFFERENCES accurate to the block-local
    class."""
    import jax.numpy as jnp

    import merge_spmv_tpu.ops.csrmv_xla as cx
    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.utils.compare import compare_results

    rs = np.random.RandomState(3)
    n, deg = 40000, 8
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rs.randint(0, n, rows.size)
    vals = rs.uniform(-1.0, 1.0, rows.size).astype(np.float32)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals))
    x = rs.uniform(0.5, 1.5, n).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    v, re_, ci = csr.to_device(dtype=np.float32)
    old_cap = cx._SCATTER_NNZ_CAP
    try:
        cx._SCATTER_NNZ_CAP = 1 << 14   # force the sorted route
        y = np.asarray(cx.csrmv_xla(v, re_, ci, jnp.asarray(x)))
        # and the 2D csrmm twin
        X = rs.uniform(-1, 1, (n, 2)).astype(np.float32)
        Y = np.asarray(cx.csrmm_xla(v, re_, ci, jnp.asarray(X)))
    finally:
        cx._SCATTER_NNZ_CAP = old_cap
    assert compare_results(y, gold, verbose=True, abs_bound=bound) is None
    goldm = csr.spmm_gold(X)
    np.testing.assert_allclose(Y, goldm, rtol=3e-4, atol=3e-4)
