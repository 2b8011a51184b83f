"""Data-layer tests: Matrix Market ingest, COO→CSR, generators, stats.

Mirrors the reference's embedded QA (SURVEY.md §4) with real unit tests:
empty rows, duplicates, symmetric/skew/pattern/array banners, generator
shapes and nonzero counts.
"""

import io
import numpy as np
import pytest

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.formats import market


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


class TestMarketParser:
    def test_general_real(self, tmp_path):
        path = _write(tmp_path, "a.mtx", """%%MatrixMarket matrix coordinate real general
% a comment
3 4 5
1 1 1.5
1 2 2.5
2 4 -3.0
3 1 4.0
3 1 0.5
""")
        coo = CooMatrix.from_market(path, use_native=False)
        assert (coo.num_rows, coo.num_cols, coo.num_nonzeros) == (3, 4, 5)
        # 1-based → 0-based
        assert coo.rows.tolist() == [0, 0, 1, 2, 2]
        assert coo.cols.tolist() == [0, 1, 3, 0, 0]
        assert coo.vals.tolist() == [1.5, 2.5, -3.0, 4.0, 0.5]

    def test_symmetric_expansion(self, tmp_path):
        path = _write(tmp_path, "s.mtx", """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 1.0
2 1 2.0
3 2 3.0
""")
        coo = CooMatrix.from_market(path, use_native=False)
        # Diagonal not mirrored: 3 + 2 = 5 nonzeros (sparse_matrix.h:357-368)
        assert coo.num_nonzeros == 5
        dense = CsrMatrix.from_coo(coo).to_dense()
        assert dense[0, 1] == 2.0 and dense[1, 0] == 2.0 and dense[0, 0] == 1.0
        assert dense[1, 2] == 3.0 and dense[2, 1] == 3.0

    def test_skew_symmetric(self, tmp_path):
        path = _write(tmp_path, "k.mtx", """%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 5.0
""")
        coo = CooMatrix.from_market(path, use_native=False)
        dense = CsrMatrix.from_coo(coo).to_dense()
        assert dense[1, 0] == 5.0 and dense[0, 1] == -5.0

    def test_pattern_default_value(self, tmp_path):
        path = _write(tmp_path, "p.mtx", """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
""")
        coo = CooMatrix.from_market(path, default_value=7.0, use_native=False)
        assert coo.vals.tolist() == [7.0, 7.0]

    def test_array_banner_column_major(self, tmp_path):
        path = _write(tmp_path, "d.mtx", """%%MatrixMarket matrix array real general
2 2
1.0
2.0
3.0
4.0
""")
        coo = CooMatrix.from_market(path, use_native=False)
        dense = CsrMatrix.from_coo(coo).to_dense()
        # Column-major fill (sparse_matrix.h:320-325)
        np.testing.assert_array_equal(dense, [[1.0, 3.0], [2.0, 4.0]])

    def test_roundtrip(self, tmp_path):
        coo = CooMatrix.grid2d(5)
        p = str(tmp_path / "rt.mtx")
        coo.to_market(p)
        coo2 = CooMatrix.from_market(p, use_native=False)
        d1 = CsrMatrix.from_coo(coo).to_dense()
        d2 = CsrMatrix.from_coo(coo2).to_dense()
        np.testing.assert_allclose(d1, d2)


class TestCsrBuild:
    def test_empty_rows_backfill(self):
        # rows 0 and 3 empty; row_offsets must repeat (sparse_matrix.h:707-727)
        coo = CooMatrix(4, 4, rows=[1, 1, 2], cols=[0, 3, 2], vals=[1., 2., 3.])
        csr = CsrMatrix.from_coo(coo)
        assert csr.row_offsets.tolist() == [0, 0, 2, 3, 3]

    def test_trailing_empty_rows(self):
        coo = CooMatrix(5, 5, rows=[0], cols=[0], vals=[1.0])
        csr = CsrMatrix.from_coo(coo)
        assert csr.row_offsets.tolist() == [0, 1, 1, 1, 1, 1]

    def test_duplicates_kept_stable(self):
        coo = CooMatrix(2, 2, rows=[0, 0, 0], cols=[1, 1, 0],
                        vals=[10., 20., 30.])
        csr = CsrMatrix.from_coo(coo)
        assert csr.num_nonzeros == 3
        # stable sort keeps the 10., 20. duplicate order
        assert csr.col_indices.tolist() == [0, 1, 1]
        assert csr.values.tolist() == [30., 10., 20.]

    def test_sorted_within_rows(self, rng):
        coo = CooMatrix.random_uniform(50, 40, 8, seed=3)
        csr = CsrMatrix.from_coo(coo)
        for r in range(50):
            lo, hi = csr.row_offsets[r], csr.row_offsets[r + 1]
            cols = csr.col_indices[lo:hi]
            assert (np.diff(cols) >= 0).all()

    def test_relabel_rows(self):
        coo = CooMatrix(3, 3, rows=[0, 1, 2], cols=[0, 1, 2], vals=[1., 2., 3.])
        csr = CsrMatrix.from_coo(coo)
        relabeled = CsrMatrix.from_coo(csr.relabel_rows([2, 0, 1]))
        dense = relabeled.to_dense()
        assert dense[2, 0] == 1.0 and dense[0, 1] == 2.0 and dense[1, 2] == 3.0


class TestGenerators:
    def test_dense(self):
        coo = CooMatrix.dense(4, 8)
        assert coo.num_nonzeros == 32
        assert CsrMatrix.from_coo(coo).to_dense().sum() == 32

    def test_wheel_shapes(self):
        # spokes+1 rows, 2*spokes nnz; row 0 has `spokes` entries, others 1
        # (sparse_matrix.h:419-452)
        coo = CooMatrix.wheel(10)
        assert (coo.num_rows, coo.num_nonzeros) == (11, 20)
        csr = CsrMatrix.from_coo(coo)
        lengths = np.diff(csr.row_offsets)
        assert lengths[0] == 10 and (lengths[1:] == 1).all()

    @pytest.mark.parametrize("w", [1, 2, 3, 5])
    def test_grid2d_nnz_formula(self, w):
        coo = CooMatrix.grid2d(w)
        interior = max(w - 2, 0) ** 2
        edge = max(w - 2, 0) * 4
        corner = 4 if w > 1 else 0
        expect = interior * 4 + edge * 3 + corner * 2
        assert coo.num_nonzeros == expect  # sparse_matrix.h:469-474
        assert coo.num_rows == w * w

    def test_grid2d_self_loop(self):
        a = CooMatrix.grid2d(4, self_loop=False)
        b = CooMatrix.grid2d(4, self_loop=True)
        assert b.num_nonzeros == a.num_nonzeros + 16

    @pytest.mark.parametrize("w", [2, 3, 4])
    def test_grid3d_nnz_formula(self, w):
        coo = CooMatrix.grid3d(w)
        i = max(w - 2, 0)
        expect = (i ** 3) * 6 + (i ** 2 * 6) * 5 + (i * 12) * 4 + 8 * 3
        assert coo.num_nonzeros == expect  # sparse_matrix.h:541-546
        assert coo.num_rows == w ** 3

    def test_grid2d_is_symmetric(self):
        d = CsrMatrix.from_coo(CooMatrix.grid2d(4)).to_dense()
        np.testing.assert_array_equal(d, d.T)

    def test_powerlaw_skew(self):
        coo = CooMatrix.random_powerlaw(1000, 1000, 20000, seed=1)
        assert coo.num_nonzeros == 20000
        s = CsrMatrix.from_coo(coo).stats()
        assert s.row_length_variation > 1.0  # genuinely skewed

    def test_uniform_flat(self):
        coo = CooMatrix.random_uniform(1000, 1000, 20, seed=1)
        s = CsrMatrix.from_coo(coo).stats()
        assert s.row_length_variation == 0.0


class TestStats:
    def test_row_length_stats(self):
        csr = CsrMatrix.from_coo(CooMatrix.wheel(100))
        s = csr.stats()
        lengths = np.diff(csr.row_offsets).astype(float)
        assert s.row_length_mean == pytest.approx(lengths.mean())
        assert s.row_length_std_dev == pytest.approx(lengths.std())  # population
        assert s.row_length_variation == pytest.approx(
            lengths.std() / lengths.mean())
        assert s.row_length_skewness > 5  # one huge row → heavy right skew

    def test_pearson_r_diagonal(self):
        # A perfectly diagonal matrix has col == row: r == 1
        coo = CooMatrix(64, 64, rows=np.arange(64), cols=np.arange(64),
                        vals=np.ones(64))
        s = CsrMatrix.from_coo(coo).stats()
        assert s.pearson_r == pytest.approx(1.0)
        assert s.diag_dist_mean == 0.0

    def test_histogram(self):
        csr = CsrMatrix.from_coo(CooMatrix.wheel(100))
        counts, max_len = csr.row_length_histogram()
        assert max_len == 100
        assert counts[0] == 0        # no empty rows
        assert counts[1] == 100      # 100 rows of length 1
        assert counts[3] == 1        # one row of length 100 (1e2 bucket)


class TestGold:
    def test_gold_matches_dense(self, rng):
        coo = CooMatrix.random_uniform(40, 30, 5, seed=7)
        csr = CsrMatrix.from_coo(coo)
        x = rng.rand(30)
        y_in = rng.rand(40)
        got = csr.spmv_gold(x, y_in, alpha=1.5, beta=0.5)
        want = 1.5 * csr.to_dense() @ x + 0.5 * y_in
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_gold_empty_rows(self):
        coo = CooMatrix(3, 3, rows=[1], cols=[1], vals=[2.0])
        csr = CsrMatrix.from_coo(coo)
        y = csr.spmv_gold(np.ones(3), np.ones(3), alpha=1.0, beta=3.0)
        np.testing.assert_allclose(y, [3.0, 5.0, 3.0])

    def test_spmm_gold(self, rng):
        coo = CooMatrix.random_powerlaw(30, 20, 200, seed=9)
        csr = CsrMatrix.from_coo(coo)
        X = rng.rand(20, 4)
        got = csr.spmm_gold(X)
        np.testing.assert_allclose(got, csr.to_dense() @ X, rtol=1e-12)


def test_rng_harness():
    from merge_spmv_tpu.utils.rng import mersenne, random_bits, random_values

    b0 = random_bits((100,), entropy_reduction=0, seed=1)
    b2 = random_bits((100,), entropy_reduction=2, seed=1)
    assert b0.dtype == np.uint32 and b2.dtype == np.uint32
    # entropy reduction biases bits toward zero (fewer set bits on average)
    assert np.unpackbits(b2.view(np.uint8)).sum() < \
        np.unpackbits(b0.view(np.uint8)).sum()
    ones = random_bits((8,), entropy_reduction=-1)
    assert (ones == 0xFFFFFFFF).all()
    masked = random_bits((64,), begin_bit=4, end_bit=12, seed=2)
    assert (masked & ~np.uint32(0xFF0)).max() == 0
    v = random_values((50,), dtype=np.float32, lo=2.0, hi=3.0, seed=3)
    assert v.dtype == np.float32 and (v >= 2.0).all() and (v < 3.0).all()
    assert isinstance(mersenne(0), np.random.RandomState)
