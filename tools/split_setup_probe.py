#!/usr/bin/env python
"""Attribute the stacked-split setup cost phase by phase at circuit5M
scale (VERDICT round-3 weak #2: split_setup_ms must drop to HYB-class
seconds).  Prints one line per phase; no artifact.

    PYTHONPATH=. python tools/split_setup_probe.py [scale] [num_bands]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()
    import numpy as np

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.split import (_row_ids, band_assignment,
                                          stack_bands)

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_large as bl
    n = int(5_558_326 * scale)
    nnz = int(56_717_547 * scale)
    t0 = time.perf_counter()
    r_, c_, v_ = bl.make_circuit_like(n, nnz)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, r_, c_, v_)).astype(np.float32)
    print(f"build matrix: {time.perf_counter()-t0:.1f}s "
          f"({csr.num_rows} rows, {csr.num_nonzeros} nnz)", flush=True)

    t0 = time.perf_counter()
    row_ids = _row_ids(csr)
    print(f"row_ids: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    band, nbands = band_assignment(csr, "quantile", num_bands=nb,
                                   row_ids=row_ids)
    print(f"band_assignment: {time.perf_counter()-t0:.2f}s "
          f"({nbands} bands)", flush=True)

    from merge_spmv_tpu.ops.plan import make_plan
    t0 = time.perf_counter()
    tile_items = make_plan(nbands * csr.num_rows, csr.num_cols,
                           csr.num_nonzeros, dtype="float32").tile_items
    print(f"tile probe: {time.perf_counter()-t0:.2f}s "
          f"(T={tile_items})", flush=True)

    t0 = time.perf_counter()
    stacked, m_pad = stack_bands(csr, band, nbands, row_ids=row_ids,
                                 tile_items=tile_items)
    print(f"stack_bands: {time.perf_counter()-t0:.2f}s "
          f"({stacked.num_rows} rows, {stacked.num_nonzeros} nnz)",
          flush=True)

    # build_operator phases (plan / meta / prepare attribution is built in)
    from merge_spmv_tpu.ops.operator import build_operator
    t0 = time.perf_counter()
    op = build_operator(stacked, dtype="float32", tile_items=tile_items)
    dt = time.perf_counter() - t0
    print(f"build_operator: {dt:.2f}s  attribution={op.setup_s}",
          flush=True)
    print(f"plan: {op.plan.describe()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
