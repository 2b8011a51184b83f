"""Merge-path search property tests (SURVEY.md §4: x+y == diagonal,
monotonicity, empty rows, duplicates, degenerate tiles)."""

import numpy as np
import pytest

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops import merge_path as mp


def _reference_search(diagonal, a, b_len):
    """Direct transliteration of the binary search contract
    (cpu_spmv.cpp:223-245) used as the property oracle."""
    x_min = max(diagonal - b_len, 0)
    x_max = min(diagonal, len(a))
    while x_min < x_max:
        pivot = (x_min + x_max) >> 1
        if a[pivot] <= diagonal - pivot - 1:
            x_min = pivot + 1
        else:
            x_max = pivot
    return min(x_min, len(a)), diagonal - x_min


CASES = [
    # (row_end_offsets, nnz)
    ([1, 2, 3, 4], 4),                 # uniform
    ([0, 0, 0, 5], 5),                 # leading empty rows
    ([5, 5, 5, 5], 5),                 # trailing empty rows
    ([2, 2, 2, 9, 9, 9, 10], 10),      # mixed empties
    ([100], 100),                      # single huge row
    ([0], 0),                          # empty matrix
    (list(range(1, 51)), 50),          # 1 nnz per row
]


class TestSearchProperties:
    @pytest.mark.parametrize("a,nnz", CASES)
    def test_matches_reference_binary_search(self, a, nnz):
        a = np.asarray(a, dtype=np.int64)
        total = len(a) + nnz
        diags = np.arange(total + 1)
        x, y = mp.merge_path_search_np(diags, a, nnz)
        for d in diags:
            rx, ry = _reference_search(d, a, nnz)
            assert (x[d], y[d]) == (rx, ry), f"diag {d}"

    @pytest.mark.parametrize("a,nnz", CASES)
    def test_invariants(self, a, nnz):
        a = np.asarray(a, dtype=np.int64)
        total = len(a) + nnz
        diags = np.arange(total + 1)
        x, y = mp.merge_path_search_np(diags, a, nnz)
        np.testing.assert_array_equal(x + y, diags)      # on the diagonal
        assert (np.diff(x) >= 0).all() and (np.diff(y) >= 0).all()
        assert x[0] == 0 and y[0] == 0
        assert x[-1] == len(a) and y[-1] == nnz          # full consumption

    def test_random_matrices_vs_oracle(self, rng):
        for seed in range(5):
            coo = CooMatrix.random_powerlaw(200, 100, 1500, seed=seed)
            csr = CsrMatrix.from_coo(coo)
            a = csr.row_end_offsets.astype(np.int64)
            nnz = csr.num_nonzeros
            diags = rng.randint(0, len(a) + nnz + 1, size=64)
            x, y = mp.merge_path_search_np(diags, a, nnz)
            for i, d in enumerate(diags):
                assert (x[i], y[i]) == _reference_search(d, a, nnz)

    def test_device_matches_host(self):
        import jax.numpy as jnp
        csr = CsrMatrix.from_coo(CooMatrix.random_powerlaw(300, 300, 2000, seed=2))
        a = csr.row_end_offsets
        nnz = csr.num_nonzeros
        diags = np.arange(0, len(a) + nnz + 1, 7)
        hx, hy = mp.merge_path_search_np(diags, a, nnz)
        dx, dy = mp.merge_path_search(jnp.asarray(diags), jnp.asarray(a), nnz)
        np.testing.assert_array_equal(np.asarray(dx), hx)
        np.testing.assert_array_equal(np.asarray(dy), hy)


class TestTileCoordinates:
    def test_tile_work_is_balanced(self):
        csr = CsrMatrix.from_coo(CooMatrix.wheel(1000))  # max skew
        tile_items = 128
        tr, tn = mp.merge_tile_coordinates_np(csr.row_end_offsets,
                                              csr.num_nonzeros, tile_items)
        work = np.diff(tr) + np.diff(tn)   # merge items per tile
        assert (work[:-1] == tile_items).all()
        assert work[-1] <= tile_items
        assert tr[-1] == csr.num_rows and tn[-1] == csr.num_nonzeros

    def test_rows_and_nnz_bounded_per_tile(self):
        csr = CsrMatrix.from_coo(CooMatrix.random_powerlaw(512, 64, 4096, seed=0))
        tile_items = 64
        tr, tn = mp.merge_tile_coordinates_np(csr.row_end_offsets,
                                              csr.num_nonzeros, tile_items)
        assert (np.diff(tr) <= tile_items).all()
        assert (np.diff(tn) <= tile_items).all()

    def test_num_merge_tiles(self):
        assert mp.num_merge_tiles(10, 90, 50) == 2
        assert mp.num_merge_tiles(10, 91, 50) == 3
        assert mp.num_merge_tiles(0, 0, 50) == 1

    def test_device_tiles_match_host(self):
        import jax.numpy as jnp
        csr = CsrMatrix.from_coo(CooMatrix.grid2d(20))
        tr, tn = mp.merge_tile_coordinates_np(csr.row_end_offsets,
                                              csr.num_nonzeros, 256)
        dtr, dtn = mp.merge_tile_coordinates(jnp.asarray(csr.row_end_offsets),
                                             csr.num_nonzeros, 256)
        np.testing.assert_array_equal(np.asarray(dtr), tr)
        np.testing.assert_array_equal(np.asarray(dtn), tn)
