"""Banded split operator: structure + differential correctness.

The split trades setup for per-call speed on scattered-column matrices
(ops/split.py); these tests check the split is a partition (every nonzero
in exactly one band, rows preserved) and that the chained-band operator
reproduces the gold SpMV/SpMM with the full alpha/beta epilogue.
"""

import numpy as np
import pytest

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.split import (build_hotcold_operator,
                                      build_split_operator,
                                      popularity_assignment,
                                      split_by_distance)
from merge_spmv_tpu.utils.compare import compare_results


def _scattered(n=4000, deg=9, spread=1500, seed=3):
    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    off = rs.laplace(0.0, spread, rows.size).astype(np.int64)
    cols = np.clip(rows + off, 0, n - 1)
    vals = rs.uniform(-1.0, 1.0, rows.size)
    return CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                              ).astype(np.float32)


def test_split_is_partition():
    csr = _scattered()
    bands, band_ids = split_by_distance(csr, edges_chunks=(1, 2))
    assert sum(b.num_nonzeros for b in bands) == csr.num_nonzeros
    for b in bands:
        assert b.num_rows == csr.num_rows
        assert b.num_cols == csr.num_cols
        assert b.row_offsets[-1] == b.num_nonzeros
        # row-sorted, and within each band the dense reconstruction matches
    dense = np.zeros((csr.num_rows,), np.float64)
    x = np.ones(csr.num_cols, np.float32)
    for b in bands:
        dense += b.astype(np.float64).spmv_gold(x.astype(np.float64))
    gold = csr.astype(np.float64).spmv_gold(x.astype(np.float64))
    assert np.allclose(dense, gold, rtol=1e-6)


def test_split_small_bands_merged():
    csr = _scattered(n=2000, spread=100)   # nearly-diagonal: outer bands tiny
    bands, _ = split_by_distance(csr, edges_chunks=(1, 2), min_frac=0.05)
    # the scattered tail is < 5%: outer bands must have been merged inward
    assert len(bands) <= 3


def test_split_operator_matches_gold():
    csr = _scattered()
    import jax.numpy as jnp
    op = build_split_operator(csr, dtype="float32", edges_chunks=(1, 2))
    assert op.num_bands >= 2, "fixture should actually split"
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y0 = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    y = op(jnp.asarray(x), y_in=jnp.asarray(y0), alpha=1.5, beta=-0.5,
           interpret=True)
    gold = csr.spmv_gold(x, y0, alpha=1.5, beta=-0.5)
    bound = csr.spmv_abs_bound(x, y0, alpha=1.5, beta=-0.5)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def test_split_quantile_operator_matches_gold():
    csr = _scattered(n=3000, deg=7, spread=900)
    import jax.numpy as jnp
    op = build_split_operator(csr, dtype="float32",
                              edges_chunks="quantile", num_bands=4)
    assert op.num_bands >= 2
    # stacked structure: B*m_pad virtual rows; real nnz conserved (the
    # stack may add zero-valued dummies padding each band to block/tile
    # boundaries)
    assert op.stacked.num_rows == op.num_bands * op._m_pad
    assert op._m_pad >= csr.num_rows
    assert op.stacked.num_nonzeros >= csr.num_nonzeros
    assert np.count_nonzero(op.stacked.values) == np.count_nonzero(csr.values)
    assert sum(op.band_nnz) == csr.num_nonzeros
    rs = np.random.RandomState(2)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y0 = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    y = op(jnp.asarray(x), y_in=jnp.asarray(y0), alpha=2.0, beta=0.25,
           interpret=True)
    gold = csr.spmv_gold(x, y0, alpha=2.0, beta=0.25)
    bound = csr.spmv_abs_bound(x, y0, alpha=2.0, beta=0.25)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def _powerlaw_cols(n=20000, deg=8, hubs=40, hub_frac=0.6, seed=7):
    """Hub-column fixture: hub_frac of the nonzeros land on a few popular
    columns scattered over the whole range (kron/webbase class)."""
    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    m = rows.size
    hub_cols = rs.choice(n, hubs, replace=False)
    is_hub = rs.random(m) < hub_frac
    cols = np.where(is_hub, hub_cols[rs.randint(0, hubs, m)],
                    rs.randint(0, n, m))
    vals = rs.uniform(-1.0, 1.0, m)
    return CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                              ).astype(np.float32)


def test_popularity_assignment_selects_hubs():
    csr = _powerlaw_cols()
    hot_mask, hot_windows = popularity_assignment(csr, coverage=0.5)
    assert hot_windows.size > 0
    # the selected mask must actually be the popular minority of windows
    assert hot_mask.sum() >= 0.3 * csr.num_nonzeros
    assert hot_windows.size * 128 < csr.num_cols
    # ascending, unique window ids
    assert (np.diff(hot_windows) > 0).all()


def test_popularity_assignment_flat_profile_selects_nothing():
    # uniform scatter: every window roughly equally popular — the split
    # must decline (the banded split owns the scatter classes)
    n, deg = 20000, 9
    rs = np.random.RandomState(5)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rs.randint(0, n, rows.size)
    vals = rs.uniform(-1, 1, rows.size)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                             ).astype(np.float32)
    hot_mask, hot_windows = popularity_assignment(csr, coverage=0.5)
    assert hot_windows.size == 0
    assert not hot_mask.any()


def test_hotcold_operator_matches_gold():
    csr = _powerlaw_cols()
    import jax.numpy as jnp
    op = build_hotcold_operator(csr, dtype="float32")
    assert op.num_hot_windows > 0, "fixture should actually split"
    assert op.hot_nnz + op.cold_nnz == csr.num_nonzeros
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y0 = rs.uniform(-1, 1, csr.num_rows).astype(np.float32)
    y = op(jnp.asarray(x), y_in=jnp.asarray(y0), alpha=1.5, beta=-0.5,
           interpret=True)
    gold = csr.spmv_gold(x, y0, alpha=1.5, beta=-0.5)
    bound = csr.spmv_abs_bound(x, y0, alpha=1.5, beta=-0.5)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def test_hotcold_operator_all_hot():
    # every nonzero on 64 columns inside 4 windows: with full coverage
    # requested the cold side is empty and only the hot launch runs
    n, deg = 1500, 5
    rs = np.random.RandomState(3)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    hub = rs.choice(512, 64, replace=False)
    cols = hub[rs.randint(0, 64, rows.size)]
    vals = rs.uniform(-1, 1, rows.size)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                             ).astype(np.float32)
    import jax.numpy as jnp
    op = build_hotcold_operator(csr, dtype="float32", coverage=1.0,
                                min_gain=0.0)
    assert op.num_hot_windows > 0 and op.cold_nnz == 0
    assert op.cold_op is None
    x = rs.uniform(-1, 1, n).astype(np.float32)
    y = op(jnp.asarray(x), interpret=True)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None


def test_hotcold_operator_mm_matches_gold():
    csr = _powerlaw_cols(n=12000, deg=6, hubs=20)
    import jax.numpy as jnp
    op = build_hotcold_operator(csr, dtype="float32")
    rs = np.random.RandomState(1)
    X = rs.uniform(-1, 1, (csr.num_cols, 3)).astype(np.float32)
    Y = op.mm(jnp.asarray(X), interpret=True)
    gold = csr.spmm_gold(X)
    err = np.max(np.abs(np.asarray(Y) - gold))
    scale = np.max(np.abs(gold)) + 1e-9
    assert err / scale < 1e-5


def test_split_operator_mm_matches_gold():
    csr = _scattered(n=1500, deg=5, spread=400)
    import jax.numpy as jnp
    op = build_split_operator(csr, dtype="float32", edges_chunks=(1,))
    rs = np.random.RandomState(1)
    X = rs.uniform(-1, 1, (csr.num_cols, 3)).astype(np.float32)
    Y = op.mm(jnp.asarray(X), interpret=True)
    gold = csr.spmm_gold(X)
    err = np.max(np.abs(np.asarray(Y) - gold))
    scale = np.max(np.abs(gold)) + 1e-9
    assert err / scale < 1e-5


def test_device_split_builder_matches_gold():
    """build_split_operator_device: band quantiles, stable reorder,
    stacked padding and row-end construction all happen on device — the
    result must match gold exactly like the host path, on both the auto
    backend and the forced-pallas interpret kernel (which exercises the
    device-computed r_win / x_win / row_span knobs)."""
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.split import build_split_operator_device

    csr = _scattered(n=6000, deg=7, spread=900, seed=11)
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)

    op = build_split_operator_device(csr, num_bands=4)
    assert op.num_bands >= 2, "fixture should actually split"
    assert sum(op.band_nnz) == csr.num_nonzeros
    y = op(jnp.asarray(x))
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None

    opp = build_split_operator_device(csr, num_bands=4, backend="pallas")
    assert opp.plan.backend == "pallas"
    yp = opp(jnp.asarray(x), interpret=True)
    assert compare_results(np.asarray(yp), gold, abs_bound=bound) is None


def test_device_split_builder_band_alignment():
    """The stack invariant: every band starts on both a 1024-nnz block
    boundary and a merge-tile boundary (stack_bands semantics)."""
    from merge_spmv_tpu.ops.split import build_split_operator_device

    csr = _scattered(n=5000, deg=8, spread=1200, seed=5)
    op = build_split_operator_device(csr, num_bands=4)
    if op.num_bands < 2:
        pytest.skip("fixture did not split")
    T = op.plan.tile_items
    m_pad = op._m_pad
    assert m_pad % 1024 == 0
    # reconstruct per-band nnz starts from the device rowends
    import numpy as np_
    ends = np_.asarray(op.op.row_end_offsets)
    for b in range(1, op.num_bands):
        start = int(ends[b * m_pad - 1])
        assert start % 1024 == 0
        assert (b * m_pad + start) % T == 0


def test_compact_row_split_matches_gold():
    """Compact per-band rows (stack_bands_compact): the stacked row count
    drops to the present rows and the epilogue becomes a row-sorted
    gather + sorted-segment prefix-difference — results must match the
    plain reshape-sum stack and gold, including alpha/beta and SpMM."""
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.split import SplitSpmvOperator
    from merge_spmv_tpu.utils.compare import compare_results

    rs = np.random.RandomState(7)
    n, nnz = 8000, 64000
    r_ = rs.randint(0, n, nnz)
    c_ = np.clip(r_ + rs.laplace(0, 500, nnz).astype(np.int64), 0, n - 1)
    csr = CsrMatrix.from_coo(CooMatrix(
        n, n, r_, c_, rs.uniform(-1, 1, nnz).astype(np.float32)))
    x = rs.uniform(0.5, 1.5, n).astype(np.float32)
    y0 = rs.uniform(-1, 1, n).astype(np.float32)
    sop = SplitSpmvOperator(csr, dtype="float32", edges_chunks="quantile",
                            num_bands=6, compact_rows=True)
    assert sop._gather_idx is not None
    assert sop.op.plan.num_rows < 6 * (-(-n // 1024) * 1024)
    y = np.asarray(sop(jnp.asarray(x)))
    assert compare_results(y, csr.spmv_gold(x),
                           abs_bound=csr.spmv_abs_bound(x)) is None
    y2 = np.asarray(sop(jnp.asarray(x), y_in=jnp.asarray(y0),
                        alpha=1.5, beta=-0.25))
    g2 = csr.spmv_gold(x, y_in=y0, alpha=1.5, beta=-0.25)
    assert compare_results(
        y2, g2, abs_bound=csr.spmv_abs_bound(x, y_in=y0, alpha=1.5,
                                             beta=-0.25)) is None
    X = rs.uniform(-1, 1, (n, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sop.mm(jnp.asarray(X))),
                               csr.spmm_gold(X), rtol=3e-4, atol=3e-4)
