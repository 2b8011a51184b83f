"""Differential tests of the merge-path Pallas kernel against the gold model.

Runs in interpret mode on CPU (exact same kernel code path as TPU modulo
Mosaic lowering); set MERGE_SPMV_TEST_TPU=1 to run compiled on real chips.
Covers the merge-path corner cases: row-spanning tiles, empty rows, the
wheel skew adversary, duplicates, multi-chunk columns, alpha/beta.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas
from merge_spmv_tpu.ops.plan import make_plan
from merge_spmv_tpu.utils.compare import assert_allclose_ulp

INTERPRET = not os.environ.get("MERGE_SPMV_TEST_TPU")


def _run(coo, tile_items=1024, alpha=1.0, beta=0.0, with_y_in=False, seed=0,
         signed=False):
    csr = CsrMatrix.from_coo(coo)
    rs = np.random.RandomState(seed)
    # Positive-bounded data for ULP comparisons (the reference verifies with
    # x = ones, utils.h:721-742 — signed sums near zero amplify ULP distance
    # beyond what any reduction order could satisfy).
    lo = -1.0 if signed else 0.1
    csr.values = rs.uniform(lo, 1, csr.num_nonzeros)
    x = rs.uniform(lo, 1, csr.num_cols).astype(np.float32)
    y_in = rs.uniform(lo, 1, csr.num_rows).astype(np.float32) if with_y_in else None
    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype=np.float32, tile_items=tile_items,
                     backend="pallas")
    v, re_, ci = csr.to_device(dtype=np.float32)
    y = csrmv_pallas(plan, v, re_, ci, jnp.asarray(x),
                     y_in=None if y_in is None else jnp.asarray(y_in),
                     alpha=alpha, beta=beta, interpret=INTERPRET)
    gold = csr.astype(np.float32).spmv_gold(x, y_in, alpha=alpha, beta=beta)
    return np.asarray(y), gold


CASES = {
    "grid2d_small": lambda: CooMatrix.grid2d(6),
    "grid2d": lambda: CooMatrix.grid2d(20),
    "wheel_single_tile": lambda: CooMatrix.wheel(100),
    "wheel_hub_spans_tiles": lambda: CooMatrix.wheel(3000),
    "empty_rows": lambda: CooMatrix(900, 64, rows=[5, 5, 850],
                                    cols=[0, 63, 3], vals=[1., 2., 3.]),
    "leading_trailing_empty": lambda: CooMatrix(2100, 32, rows=[1050],
                                                cols=[7], vals=[2.0]),
    "duplicates": lambda: CooMatrix(4, 4, rows=[1, 1, 1], cols=[2, 2, 2],
                                    vals=[1., 2., 3.]),
    "powerlaw": lambda: CooMatrix.random_powerlaw(800, 700, 6000, seed=3),
    "dense_rows": lambda: CooMatrix.dense(50, 60),
    "multi_chunk_cols": lambda: CooMatrix.random_uniform(300, 6000, 8, seed=9),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pallas_vs_gold(name):
    got, want = _run(CASES[name]())
    assert_allclose_ulp(got, want, context=name)


def test_tile_boundary_exact_row_end():
    # a row ending exactly on a tile boundary must leave carry == 0
    # (merge search consumes the row-end before the next tile)
    coo = CooMatrix.random_uniform(256, 128, 8, seed=1)  # 2048 nnz: aligned rows
    got, want = _run(coo, tile_items=1024)
    assert_allclose_ulp(got, want, context="tile_boundary")


def test_alpha_beta():
    got, want = _run(CASES["powerlaw"](), alpha=2.5, beta=-0.75,
                     with_y_in=True)
    assert_allclose_ulp(got, want, context="alpha_beta")


def test_larger_tile_items():
    got, want = _run(CASES["wheel_hub_spans_tiles"](), tile_items=2048)
    assert_allclose_ulp(got, want, context="tile2048")


def test_signed_values_rtol():
    # signed data with cancellation: relative tolerance instead of ULP
    got, want = _run(CASES["powerlaw"](), signed=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_auto_plan_routes_pallas_on_tpu():
    plan = make_plan(1000, 1000, 5000, dtype=np.float32, backend="auto")
    if jax.default_backend() == "tpu":
        assert plan.backend == "pallas"
    else:
        assert plan.backend == "xla"


def test_csrmm_pallas_vs_gold():
    from merge_spmv_tpu.ops.csrmv_pallas import csrmm_column_loop

    coo = CASES["powerlaw"]()
    csr = CsrMatrix.from_coo(coo).astype(np.float32)
    rs = np.random.RandomState(4)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    X = rs.uniform(0.1, 1, (csr.num_cols, 3)).astype(np.float32)
    Y_in = rs.uniform(0.1, 1, (csr.num_rows, 3)).astype(np.float32)
    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype=np.float32, tile_items=2048, backend="pallas")
    got = csrmm_column_loop(plan, *csr.to_device(dtype=np.float32),
                       jnp.asarray(X), Y_in=jnp.asarray(Y_in),
                       alpha=1.5, beta=0.5, interpret=INTERPRET)
    want = csr.spmm_gold(X, Y_in, alpha=1.5, beta=0.5)
    assert_allclose_ulp(np.asarray(got), want, context="csrmm_pallas")


def test_fp64_double_single_route():
    """fp64 routes through three fp32 merge-kernel passes (pallas_ds);
    verified at the reference's fp64 tolerance level (fp32 ULP,
    utils.h:726-728)."""
    import jax

    from merge_spmv_tpu.ops.csrmv import csrmv

    with jax.enable_x64(True):
        coo = CASES["powerlaw"]()
        csr = CsrMatrix.from_coo(coo)
        rs = np.random.RandomState(7)
        csr.values = rs.uniform(0.1, 1, csr.num_nonzeros)  # float64
        x = rs.uniform(0.1, 1, csr.num_cols)
        plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                         dtype=np.float64, tile_items=2048,
                         backend="pallas_ds")
        v, re_, ci = csr.to_device(dtype=np.float64)
        assert v.dtype == jnp.float64
        y = csrmv(plan, v, re_, ci, jnp.asarray(x), interpret=INTERPRET)
        assert y.dtype == jnp.float64
        gold = csr.spmv_gold(x)
        # products carry ~2^-48 accuracy; accumulation is fp32 — compare
        # at fp32 ULP like the reference comparator does for fp64
        assert_allclose_ulp(np.asarray(y).astype(np.float32),
                            gold.astype(np.float32), context="pallas_ds")
        # double-single beats plain fp32: check the lo-word mattered
        y32 = csrmv(dataclasses_replace32(plan), v.astype(jnp.float32),
                    re_, ci, jnp.asarray(x).astype(jnp.float32),
                    interpret=INTERPRET)
        err_ds = np.abs(np.asarray(y) - gold).max()
        err_32 = np.abs(np.asarray(y32).astype(np.float64) - gold).max()
        assert err_ds <= err_32 * 1.5 + 1e-12


def dataclasses_replace32(plan):
    import dataclasses
    return dataclasses.replace(plan, dtype="float32", backend="pallas")


def test_operator_prepared_path_matches_raw():
    """The operator's prepare-once fast path must agree with the raw
    per-call padding path bit-for-bit (same kernel, same inputs)."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES["powerlaw"]()).astype(np.float32)
    rs = np.random.RandomState(6)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    y_in = rs.uniform(0.1, 1, csr.num_rows).astype(np.float32)

    op = build_operator(csr, dtype="float32", backend="pallas")
    assert op._prep is not None
    y_prep = op(jnp.asarray(x), y_in=jnp.asarray(y_in), alpha=2.0,
                beta=-0.5, interpret=INTERPRET)
    v, re_, ci = csr.to_device(dtype=np.float32)
    y_raw = csrmv_pallas(op.plan, v, re_, ci, jnp.asarray(x),
                         y_in=jnp.asarray(y_in), alpha=2.0, beta=-0.5,
                         interpret=INTERPRET, meta=op.meta)
    np.testing.assert_array_equal(np.asarray(y_prep), np.asarray(y_raw))
    gold = csr.spmv_gold(x, y_in, alpha=2.0, beta=-0.5)
    bound = csr.spmv_abs_bound(x, y_in, alpha=2.0, beta=-0.5)
    assert_allclose_ulp(np.asarray(y_prep), gold, context="prepared",
                        abs_bound=bound)


def test_x_window_streaming():
    """x larger than the (test-shrunk) VMEM budget: per-tile column
    windows are streamed; both the operator metadata path and the device
    range fallback must agree with gold."""
    from merge_spmv_tpu.ops.gather_plan import (gather_meta_np,
                                                pack_tile_meta_np,
                                                tile_col_meta_np)
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np

    rs = np.random.RandomState(11)
    n = 60000
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows + rs.randint(-400, 400, rows.size), 0, n - 1)
    coo = CooMatrix(n, n, rows.astype(np.int32), cols.astype(np.int32),
                    rs.uniform(0.1, 1, rows.size))
    csr = CsrMatrix.from_coo(coo).astype(np.float32)
    x = rs.uniform(0.1, 1, n).astype(np.float32)
    gold = csr.spmv_gold(x)

    plan = make_plan(n, n, csr.num_nonzeros, dtype=np.float32,
                     tile_items=2048, backend="pallas",
                     vmem_bytes=256 * 1024,  # x (240 KB) over the half-budget
                     row_end_offsets=csr.row_offsets[1:],
                     col_indices=csr.col_indices,
                     allow_x_streaming=True)
    assert plan.x_win > 0, plan.describe()
    v, re_, ci = csr.to_device(dtype=np.float32)

    # operator-style metadata path
    bpt = (plan.tile_items + 1024) // 1024 + 1
    cnt, lst = gather_meta_np(csr.col_indices, csr.num_nonzeros,
                              pad_blocks=bpt,
                              shift=10 if plan.meta_gran == 1024 else 7)
    _, tile_nnz = merge_tile_coordinates_np(csr.row_offsets[1:],
                                            csr.num_nonzeros,
                                            plan.tile_items)
    packed = pack_tile_meta_np(cnt, lst, tile_nnz, plan.tile_items)
    cbase, _ = tile_col_meta_np(csr.col_indices, csr.num_nonzeros,
                                csr.row_offsets[1:], plan.tile_items)
    y = csrmv_pallas(plan, v, re_, ci, jnp.asarray(x),
                     meta=(jnp.asarray(packed), jnp.asarray(cbase)),
                     interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), gold, context="x_window_meta")

    # device range fallback (no host metadata)
    y2 = csrmv_pallas(plan, v, re_, ci, jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y2), gold, context="x_window_range")


def test_x_window_range_cbase_band_boundary():
    """Round-4 regression (BENCH_LARGE split verify=FAIL): the device-side
    range-mode cbase took its window min over b0 + arange(BPT) blocks —
    past row-dominated tiles' own nnz into the NEXT tile's blocks.  On a
    stacked-band shape (high-column rows, then an empty-row run, then
    low-column rows) that dragged cbase toward the next band's columns
    until the tile's own columns fell past cbase + x_win and the kernel
    clip-fetched wrong x rows.  Build exactly that shape with streaming
    forced and the device range fallback (no host metadata)."""
    from merge_spmv_tpu.ops.split import band_assignment, stack_bands

    rs = np.random.RandomState(13)
    n = 40000
    # scattered columns on both sides of the diagonal so the quantile
    # split yields distance bands whose column ranges differ sharply
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows + rs.choice([-1, 1], rows.size)
                   * rs.randint(2000, 6000, rows.size), 0, n - 1)
    csr0 = CsrMatrix.from_coo(CooMatrix(
        n, n, rows.astype(np.int32), cols.astype(np.int32),
        rs.uniform(0.1, 1, rows.size))).astype(np.float32)
    band, nb = band_assignment(csr0, "quantile", num_bands=4)
    tile_items = 4096
    stacked, m_pad = stack_bands(csr0, band, nb, tile_items=tile_items)
    x = rs.uniform(0.1, 1, n).astype(np.float32)
    gold_v = stacked.spmv_gold(x)
    plan = make_plan(stacked.num_rows, n, stacked.num_nonzeros,
                     dtype=np.float32, tile_items=tile_items,
                     backend="pallas",
                     vmem_bytes=240 * 1024,   # force streaming
                     row_end_offsets=stacked.row_offsets[1:],
                     col_indices=stacked.col_indices, meta_k=0,
                     allow_x_streaming=True)
    assert plan.x_win > 0, plan.describe()
    v, re_, ci = stacked.to_device(dtype=np.float32)
    y = csrmv_pallas(plan, v, re_, ci, jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y)[:stacked.num_rows], gold_v,
                        context="cbase_band_boundary")


@pytest.mark.parametrize("name", ["grid2d", "powerlaw", "multi_chunk_cols",
                                  "wheel_hub_spans_tiles"])
def test_gather_group_operator_matches_gold(name):
    """gather_group > 1: union window lists shared by G consecutive
    blocks (the fetch-amortizing products path) must reproduce gold."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES[name]()).astype(np.float32)
    rs = np.random.RandomState(7)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas",
                        tile_items=2048, gather_group=4,
                        runtime_skip=False)
    if op.plan.gather_group == 1:
        pytest.skip("group meta not viable for this shape (K_G cap)")
    assert op.plan.meta_k > 0
    y = op(jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), csr.spmv_gold(x),
                        context=f"gather_group:{name}")


def test_gather_group_streamed_x():
    """Group gather composed with per-tile x-window streaming."""
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.ops import plan as plan_mod

    rs = np.random.RandomState(12)
    n = 20000
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows + rs.randint(-300, 300, rows.size), 0, n - 1)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(0.1, 1, rows.size))
                             ).astype(np.float32)
    from merge_spmv_tpu.ops.plan import make_plan as mp
    plan = mp(csr.num_rows, csr.num_cols, csr.num_nonzeros,
              dtype="float32", backend="pallas", tile_items=2048,
              vmem_bytes=128 * 1024, gather_group=4, runtime_skip=False,
              row_end_offsets=csr.row_offsets[1:],
              col_indices=csr.col_indices)
    if plan.gather_group == 1 or plan.x_win == 0:
        pytest.skip("shape did not produce a streamed group plan")
    from merge_spmv_tpu.ops.operator import SpmvOperator, _build_packed_meta
    meta = _build_packed_meta(plan, csr.row_offsets[1:], csr.col_indices)
    v, re_, ci = csr.to_device(dtype=np.float32)
    op = SpmvOperator(plan, v, re_, ci, meta=meta)
    x = rs.uniform(0.1, 1, n).astype(np.float32)
    y = op(jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), csr.spmv_gold(x),
                        context="gather_group_streamed")


@pytest.mark.parametrize("name,tile_items",
                         [("grid2d", 2048), ("powerlaw", 4096),
                          ("wheel_hub_spans_tiles", 1024)])
def test_rowends_vmem_resident(name, tile_items):
    """Resident row-ends mode (x+y VMEM-resident plans): the whole padded
    row-end table is staged once at t==0 and per-step row-end DMAs are
    dropped — results must match gold, including across tile-spanning
    rows and the skew adversary (the skip path reads the same table)."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES[name]()).astype(np.float32)
    rs = np.random.RandomState(11)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas",
                        tile_items=tile_items)
    assert op.plan.rowends_vmem, "small x+y plans must stage row ends"
    y = op(jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), csr.spmv_gold(x),
                        context=f"rowends_vmem:{name}")


def test_rowends_vmem_disabled_when_budget_exceeded():
    """The resident row-end table must stay off when the working set
    would not leave VMEM headroom (tiny budget forces the streamed
    per-tile row-end windows)."""
    csr = CsrMatrix.from_coo(CASES["grid2d"]()).astype(np.float32)
    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     backend="pallas", tile_items=2048,
                     vmem_bytes=64 * 1024,
                     row_end_offsets=csr.row_offsets[1:],
                     col_indices=csr.col_indices)
    assert not plan.rowends_vmem


@pytest.mark.parametrize("name", ["grid2d", "powerlaw", "multi_chunk_cols",
                                  "wheel_hub_spans_tiles", "empty_rows"])
def test_gather_cluster_operator_matches_gold(name):
    """Cluster-gather mode: one 8-row fetch per contiguous window cluster,
    visits served by in-register barrel rolls (gather_plan.cluster_meta_np)
    — must reproduce gold, including alpha/beta."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES[name]()).astype(np.float32)
    rs = np.random.RandomState(9)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    y_in = rs.uniform(0.1, 1, csr.num_rows).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas",
                        tile_items=2048, gather_cluster=True,
                        runtime_skip=False)
    if not op.plan.cluster_widths:
        pytest.skip("cluster cover not viable for this shape")
    y = op(jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), csr.spmv_gold(x),
                        context=f"gather_cluster:{name}")
    y2 = op(jnp.asarray(x), y_in=jnp.asarray(y_in), alpha=2.0, beta=-0.5,
            interpret=INTERPRET)
    # beta < 0 makes near-cancelling rows: the cumsum-difference reduction
    # carries ~eps*block_total there (NOTES.md) — compare against the
    # backward-error bound the bench harness uses
    assert_allclose_ulp(np.asarray(y2),
                        csr.spmv_gold(x, y_in=y_in, alpha=2.0, beta=-0.5),
                        abs_bound=csr.spmv_abs_bound(x, y_in, alpha=2.0,
                                                     beta=-0.5),
                        context=f"gather_cluster_ab:{name}")


def test_gather_cluster_excluded_from_streaming():
    """Cluster mode must stay off for x-streaming plans (fetch bases are
    window-relative there), but IS allowed under the runtime-skip path
    (the skew pair must not regress relative to a cluster-fast uniform)."""
    plan = make_plan(3_000_000, 3_000_000, 10_000_000, dtype=np.float32,
                     backend="pallas", row_end_offsets=None,
                     col_indices=None, gather_cluster=True)
    assert not plan.cluster_widths
    csr = CsrMatrix.from_coo(CASES["wheel_hub_spans_tiles"]()
                             ).astype(np.float32)
    plan2 = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                      dtype=np.float32, backend="pallas", tile_items=2048,
                      row_end_offsets=csr.row_offsets[1:],
                      col_indices=csr.col_indices,
                      gather_cluster=True, runtime_skip=True)
    assert plan2.cluster_widths


@pytest.mark.parametrize("name", ["wheel_hub_spans_tiles", "powerlaw"])
def test_gather_cluster_skip_path_matches_gold(name):
    """Cluster gather composed with the runtime-skip (skew) kernel form."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES[name]()).astype(np.float32)
    rs = np.random.RandomState(17)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas",
                        tile_items=2048, gather_cluster=True,
                        runtime_skip=True)
    if not op.plan.cluster_widths:
        pytest.skip("cluster cover not viable for this shape")
    assert op.plan.runtime_skip
    y = op(jnp.asarray(x), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(y), csr.spmv_gold(x),
                        context=f"gather_cluster_skip:{name}")


def test_gather_cluster_mm_column_loop():
    """A cluster-mode operator's SpMM column loop reuses the cluster meta
    (plan and packed meta must stay consistent through csrmm)."""
    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES["grid2d"]()).astype(np.float32)
    rs = np.random.RandomState(21)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    X = rs.uniform(0.1, 1, (csr.num_cols, 3)).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas",
                        tile_items=2048, gather_cluster=True,
                        runtime_skip=False)
    if not op.plan.cluster_widths:
        pytest.skip("cluster cover not viable for this shape")
    Y = op.mm(jnp.asarray(X), interpret=INTERPRET)
    assert_allclose_ulp(np.asarray(Y), csr.spmm_gold(X),
                        context="gather_cluster_mm")


def test_fused_ds_operator_fine_and_coarse():
    """FUSED double-single fp64 (one kernel pass over (hi, lo) pairs,
    csrmv_pallas.prepare_csrmv_ds) vs gold at the reference's fp64
    verification level (fp32 ULP, utils.h:726-728) — both gather
    granularities (the round-5 coarse-list tree bug was invisible to a
    fine-only test)."""
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results

    with jax.enable_x64(True):
        rs = np.random.RandomState(11)
        # fine-gran banded + coarse-gran (wider normal offsets)
        for name, sigma in (("fine", 40.0), ("coarse", 400.0)):
            n, deg = 4000, 8
            rows = np.repeat(np.arange(n, dtype=np.int64), deg)
            cols = np.clip(rows + rs.normal(0, sigma, rows.size
                                            ).astype(np.int64), 0, n - 1)
            vals = rs.uniform(-1.0, 1.0, rows.size)
            csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals))
            x = rs.uniform(0.5, 1.5, n)
            op = build_operator(csr, dtype="float64", tile_items=8192,
                                backend="pallas_ds")
            assert op.plan.backend == "pallas_ds"
            assert op._plan32.ds
            y = np.asarray(op(jnp.asarray(x), interpret=INTERPRET))
            assert y.dtype == np.float64
            err = compare_results(y, csr.spmv_gold(x), verbose=True,
                                  abs_bound=csr.spmv_abs_bound(x))
            assert err is None, f"{name}: mismatch at {err}"


def test_gather_style_tree_and_stage_match_chain():
    """The tree / stage accumulation styles are bit-identical refactors
    of the chain serve (each element matches exactly one window)."""
    import dataclasses

    from merge_spmv_tpu.ops.operator import build_operator

    csr = CsrMatrix.from_coo(CASES["powerlaw"]()).astype(np.float32)
    rs = np.random.RandomState(5)
    csr.values = rs.uniform(0.1, 1, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1, csr.num_cols).astype(np.float32)
    op = build_operator(csr, dtype="float32", tile_items=2048,
                        gather_cluster=False, backend="pallas")
    from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas_prepared
    outs = {}
    for style in ("chain", "tree", "stage"):
        p2 = dataclasses.replace(op.plan, gather_style=style)
        outs[style] = np.asarray(csrmv_pallas_prepared(
            p2, op._prep, jnp.asarray(x), interpret=INTERPRET))
    np.testing.assert_array_equal(outs["chain"], outs["tree"])
    np.testing.assert_array_equal(outs["chain"], outs["stage"])


def test_dlist_mode_vs_gold():
    """Dynamic distinct-chunk gather lists (plan.dlist): strays that
    blow the [lo, hi] range walk to the whole table must not change
    correctness; the walk runs cnt DISTINCT SMEM-listed chunks."""
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results

    rs = np.random.RandomState(6)
    n, deg = 300000, 2
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    local = rs.random(rows.size) < 0.95
    cols = np.where(local,
                    np.clip(rows + rs.randint(-1024, 1024, rows.size),
                            0, n - 1),
                    rs.randint(0, n, rows.size))
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(0.1, 1, rows.size))
                             ).astype(np.float32)
    op = build_operator(csr, dtype="float32", backend="pallas")
    assert op.plan.dlist, op.plan.describe()
    x = rs.uniform(0.1, 1, n).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x), interpret=INTERPRET))
    err = compare_results(y, csr.spmv_gold(x), verbose=True,
                          abs_bound=csr.spmv_abs_bound(x))
    assert err is None, f"dlist mismatch at {err}"
