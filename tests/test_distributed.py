"""Multi-chip merge-path CsrMV tests on the simulated 8-device CPU mesh
(SURVEY.md §4: test multi-host logic without a pod)."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.parallel.partition import partition_csr
from merge_spmv_tpu.parallel.distributed import (distributed_csrmv,
                                                 materialize_y)
from merge_spmv_tpu.utils.compare import assert_allclose_ulp


def _mesh(n):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs), ("shards",))


MATRICES = {
    "grid2d": lambda: CooMatrix.grid2d(15),
    "wheel": lambda: CooMatrix.wheel(500),            # hub spans shards
    "powerlaw": lambda: CooMatrix.random_powerlaw(400, 300, 3000, seed=2),
    "empty_rows": lambda: CooMatrix(350, 40, rows=[10, 300],
                                    cols=[0, 39], vals=[1.0, 2.0]),
    "giant_row": lambda: CooMatrix(9, 4000,
                                   rows=np.zeros(4000, np.int64),
                                   cols=np.arange(4000),
                                   vals=np.ones(4000)),  # spans many shards
}


class TestPartition:
    def test_balanced_merge_work(self):
        csr = CsrMatrix.from_coo(MATRICES["wheel"]())
        part = partition_csr(csr, 8)
        work = np.diff(part.row_starts.astype(np.int64)) + \
            np.diff(np.concatenate([[0], np.cumsum(part.meta[:, 3])]))
        per = -(-(csr.num_rows + csr.num_nonzeros) // 8)
        assert (work <= per).all()

    def test_nnz_conserved(self):
        csr = CsrMatrix.from_coo(MATRICES["powerlaw"]())
        part = partition_csr(csr, 8)
        assert part.meta[:, 3].sum() == csr.num_nonzeros


@pytest.mark.parametrize("name", sorted(MATRICES))
@pytest.mark.parametrize("n_shards", [2, 8])
def test_distributed_vs_gold(name, n_shards):
    mesh = _mesh(n_shards)
    csr = CsrMatrix.from_coo(MATRICES[name]())
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.1, 1.0, csr.num_nonzeros)
    x = rs.uniform(0.1, 1.0, csr.num_cols).astype(np.float32)
    part = partition_csr(csr, n_shards, dtype=np.float32)
    yw = distributed_csrmv(mesh, part, x)
    y = materialize_y(yw, part)
    gold = csr.astype(np.float32).spmv_gold(x)
    assert_allclose_ulp(y, gold, context=f"{name}/{n_shards}")


def _banded(n, half_bw, deg, seed):
    r = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = np.clip(rows + r.randint(-half_bw, half_bw + 1, rows.size),
                   0, n - 1)
    return CooMatrix(n, n, rows, cols, r.uniform(0.1, 1, rows.size))


def test_halo_x_mode_selected_and_correct():
    """Banded matrix → halo x sharding (no replication): two neighbor
    ppermutes of the block edges; result must still match gold."""
    mesh = _mesh(8)
    csr = CsrMatrix.from_coo(_banded(4096, 300, 4, 7))
    part = partition_csr(csr, 8, dtype=np.float32)
    assert part.x_mode == "halo", (part.x_mode, part.halo, part.cpad)
    assert part.halo <= part.cpad
    x = np.random.RandomState(1).uniform(0.1, 1, csr.num_cols).astype(np.float32)
    y = materialize_y(distributed_csrmv(mesh, part, x), part)
    assert_allclose_ulp(y, csr.astype(np.float32).spmv_gold(x),
                        context="halo_banded")


def test_scattered_matrix_falls_back_to_replicate():
    csr = CsrMatrix.from_coo(CooMatrix.random_uniform(2000, 2000, 4, seed=8))
    part = partition_csr(csr, 8, dtype=np.float32)
    assert part.x_mode == "replicate"


def test_carry_dst_precomputed_giant_row():
    """All shards inside a giant row route their carry straight to the
    completing shard (no chain); dst is static partition metadata."""
    csr = CsrMatrix.from_coo(MATRICES["giant_row"]())
    part = partition_csr(csr, 8, dtype=np.float32)
    dst = part.meta[:, 5]
    owned = part.meta[:, 4]
    # the giant row occupies the early shards; each of them targets the
    # same completing shard
    spanning = part.meta[:, 4] < part.meta[:, 2]
    assert (dst[spanning][:-1] >= np.arange(8)[spanning][:-1]).all()
    zero_owned = np.nonzero(owned == 0)[0]
    if len(zero_owned):
        d0 = dst[zero_owned[0]]
        assert (dst[zero_owned] == d0).all()


def test_alpha_scaling():
    mesh = _mesh(4)
    csr = CsrMatrix.from_coo(MATRICES["grid2d"]())
    x = np.ones(csr.num_cols, np.float32)
    part = partition_csr(csr, 4, dtype=np.float32)
    y = materialize_y(distributed_csrmv(mesh, part, x, alpha=2.5), part)
    gold = csr.astype(np.float32).spmv_gold(x, alpha=2.5)
    assert_allclose_ulp(y, gold, context="alpha")


def test_distributed_pallas_local_backend():
    """Per-shard Pallas merge kernel under shard_map (interpret on CPU)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.parallel.partition import partition_csr
    from merge_spmv_tpu.parallel.distributed import (distributed_csrmv,
                                                     materialize_y)
    from merge_spmv_tpu.utils.compare import assert_allclose_ulp

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("shards",))
    csr = CsrMatrix.from_coo(
        CooMatrix.random_powerlaw(300, 250, 2500, seed=5)).astype(np.float32)
    rs = np.random.RandomState(1)
    csr.values = rs.uniform(0.1, 1.0, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1.0, csr.num_cols).astype(np.float32)
    part = partition_csr(csr, 4, dtype=np.float32)
    yw = distributed_csrmv(mesh, part, x, local_backend="pallas")
    y = materialize_y(yw, part)
    assert_allclose_ulp(y, csr.spmv_gold(x), context="distributed_pallas")


def test_prepared_distributed_csrmv():
    """Prepared SPMD path: per-shard gather/row lists under one plan."""
    import jax
    from jax.sharding import Mesh

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.parallel.partition import partition_csr
    from merge_spmv_tpu.parallel.distributed import (
        PreparedDistributedCsrmv, materialize_y)
    from merge_spmv_tpu.utils.compare import assert_allclose_ulp

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("shards",))
    rs = np.random.RandomState(2)
    for name, coo in (
            ("banded", CooMatrix.grid2d(40)),
            ("powerlaw", CooMatrix.random_powerlaw(300, 250, 2500, seed=5)),
            ("wheel", CooMatrix.wheel(900))):
        csr = CsrMatrix.from_coo(coo).astype(np.float32)
        csr.values = rs.uniform(0.1, 1.0, csr.num_nonzeros
                                ).astype(np.float32)
        x = rs.uniform(0.1, 1.0, csr.num_cols).astype(np.float32)
        part = partition_csr(csr, 4, dtype=np.float32)
        op = PreparedDistributedCsrmv(mesh, part)
        y = materialize_y(op(x), part)
        assert_allclose_ulp(y, csr.spmv_gold(x),
                            context=f"prepared_dist_{name}")
        # repeat call hits the same compiled fn (prepare-once contract)
        y2 = materialize_y(op(x), part)
        assert_allclose_ulp(y2, csr.spmv_gold(x),
                            context=f"prepared_dist_{name}_repeat")
