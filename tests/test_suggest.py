"""Structure-probe suggester (ops/suggest.py): each class maps to its
operator, and the built operator reproduces gold."""

import numpy as np

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.suggest import build_suggested, suggest_backend
from merge_spmv_tpu.utils.compare import compare_results


def test_suggest_stencil_is_dia():
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(10)).astype(np.float32)
    rec = suggest_backend(csr)
    assert rec["backend"] == "dia"


def test_suggest_hub_columns_is_hotcold():
    rs = np.random.RandomState(7)
    n, deg = 20000, 8
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    hub = rs.choice(n, 40, replace=False)
    is_hub = rs.random(rows.size) < 0.6
    cols = np.where(is_hub, hub[rs.randint(0, 40, rows.size)],
                    rs.randint(0, n, rows.size))
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(-1, 1, rows.size))
                             ).astype(np.float32)
    rec = suggest_backend(csr)
    assert rec["backend"] == "hotcold"


def test_suggest_wide_scatter_is_split():
    rs = np.random.RandomState(3)
    n, deg = 300_000, 4
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    off = rs.laplace(0.0, 60_000, rows.size).astype(np.int64)
    # modular wrap, not clip: clipping piles mass on columns 0 / n-1 and
    # fabricates hub windows the real circuit class does not have
    cols = (rows + off) % n
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(-1, 1, rows.size))
                             ).astype(np.float32)
    rec = suggest_backend(csr)
    assert rec["backend"] == "split"


def test_suggest_local_uniform_is_merge():
    rs = np.random.RandomState(5)
    n, deg = 50_000, 8
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = np.clip(rows + rs.randint(-2048, 2049, rows.size), 0, n - 1)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                       rs.uniform(-1, 1, rows.size))
                             ).astype(np.float32)
    rec = suggest_backend(csr)
    assert rec["backend"] == "merge"


def test_build_suggested_matches_gold():
    import jax.numpy as jnp
    csr = CsrMatrix.from_coo(CooMatrix.grid2d(40)).astype(np.float32)
    op, rec = build_suggested(csr, dtype="float32")
    assert rec["backend"] == "dia"
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, csr.num_cols).astype(np.float32)
    y = op(jnp.asarray(x))
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    assert compare_results(np.asarray(y), gold, abs_bound=bound) is None
