"""Native host library (native/market_io.cpp) vs the NumPy data layer.

Differential tests: the C++ parser and COO→CSR must agree with the Python
implementations on every banner variant and corner the reference parser
handles (sparse_matrix.h:217-380, :666-728).  Skipped when no toolchain is
available to build the library.
"""

import os
import tempfile

import numpy as np
import pytest

from merge_spmv_tpu.formats import market
from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix

native_io = pytest.importorskip("merge_spmv_tpu.formats.native_io")

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native host library not built")


FILES = {
    "general": """%%MatrixMarket matrix coordinate real general
% comment
3 4 4
1 1 0.5
2 3 -1.25
3 4 2.0
1 1 3.0
""",
    "symmetric": """%%MatrixMarket matrix coordinate real symmetric
4 4 4
1 1 1.0
3 1 2.0
4 2 3.0
4 4 4.0
""",
    "skew": """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 5.0
3 2 -1.5
""",
    "pattern": """%%MatrixMarket matrix coordinate pattern general
3 3 3
1 2
2 3
3 1
""",
    "array": """%%MatrixMarket matrix array real general
2 3
1.0
2.0
3.0
4.0
5.0
6.0
""",
    "integer": """%%MatrixMarket matrix coordinate integer general
2 2 2
1 1 7
2 2 -3
""",
}


def _write(text):
    f = tempfile.NamedTemporaryFile("w", suffix=".mtx", delete=False)
    f.write(text)
    f.close()
    return f.name


@pytest.mark.parametrize("name", sorted(FILES))
def test_parser_parity(name):
    path = _write(FILES[name])
    try:
        got = native_io.read_market(path, default_value=1.0)
        want = market.read_market(path, default_value=1.0)
    finally:
        os.unlink(path)
    assert got[0] == want[0] and got[1] == want[1]
    g_r, g_c, g_v = got[2], got[3], got[4]
    w_r, w_c, w_v = want[2], want[3], want[4]
    assert len(g_v) == len(w_v)
    go = np.lexsort((g_c, g_r))
    wo = np.lexsort((w_c, w_r))
    np.testing.assert_array_equal(g_r[go], w_r[wo])
    np.testing.assert_array_equal(g_c[go], w_c[wo])
    np.testing.assert_allclose(g_v[go], w_v[wo])


def test_coo_to_csr_parity():
    coo = CooMatrix.random_powerlaw(500, 400, 5000, seed=7)
    want = CsrMatrix.from_coo(coo, use_native=False)
    ro, ci, vals = native_io.coo_to_csr(coo.num_rows, coo.rows, coo.cols,
                                        coo.vals)
    np.testing.assert_array_equal(ro, want.row_offsets)
    np.testing.assert_array_equal(ci, want.col_indices)
    np.testing.assert_allclose(vals, want.values)


def test_coo_to_csr_empty_rows_and_duplicates():
    coo = CooMatrix(7, 5, rows=[3, 3, 3, 6], cols=[2, 2, 1, 0],
                    vals=[1.0, 2.0, 3.0, 4.0])
    ro, ci, vals = native_io.coo_to_csr(coo.num_rows, coo.rows, coo.cols,
                                        coo.vals)
    np.testing.assert_array_equal(ro, [0, 0, 0, 0, 3, 3, 3, 4])
    # stable: the duplicate (3,2) pair keeps file order after col sort
    np.testing.assert_array_equal(ci, [1, 2, 2, 0])
    np.testing.assert_allclose(vals, [3.0, 1.0, 2.0, 4.0])


def test_large_roundtrip_through_from_coo():
    coo = CooMatrix.random_uniform(1200, 900, 64, seed=1)  # 76800 nnz > 2^16
    native = CsrMatrix.from_coo(coo, use_native=True)
    python = CsrMatrix.from_coo(coo, use_native=False)
    np.testing.assert_array_equal(native.row_offsets, python.row_offsets)
    np.testing.assert_array_equal(native.col_indices, python.col_indices)
    np.testing.assert_allclose(native.values, python.values)
