#!/usr/bin/env python
"""Measure the compact-row split (stack_bands_compact) on the circuit
class vs the plain stacked split.  Writes SPLIT_COMPACT.json.

Usage: PYTHONPATH=. python tools/split_compact_bench.py [n nnz] [B ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax.numpy as jnp

    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()
    import bench_large as bl
    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.split import build_split_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import (ingraph_rate_ms,
                                             split_operator_step_fn)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_389_581
    nnz = int(args[1]) if len(args) > 1 else 14_881_072
    bands = [int(b) for b in args[2:]] or [24]

    t0 = time.time()
    r_, c_, v_ = bl.make_circuit_like(n, nnz)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, r_, c_, v_)).astype(np.float32)
    print(f"matrix {csr.num_rows} nnz={csr.num_nonzeros} "
          f"({time.time()-t0:.0f}s)", flush=True)
    x = np.random.RandomState(1).uniform(0.1, 1.0, n).astype(np.float32)
    gold = csr.spmv_gold(x)
    xd = jnp.asarray(x)

    out = {"matrix": f"circuit_like n={n} nnz={csr.num_nonzeros}",
           "timing": "ingraph", "configs": {}}
    for nb in bands:
        t0 = time.time()
        sop = build_split_operator(csr, dtype="float32",
                                   edges_chunks="quantile", num_bands=nb,
                                   compact_rows=True)
        y = sop(xd)
        ok = compare_results(np.asarray(y), gold, verbose=True) is None
        setup = time.time() - t0
        print(f"B={nb} compact: stacked_rows={sop.op.plan.num_rows} "
              f"verify={'PASS' if ok else 'FAIL'} (setup+compile "
              f"{setup:.0f}s)", flush=True)
        t1 = time.time()
        ms = ingraph_rate_ms(split_operator_step_fn(sop), xd, steps=16)
        print(f"  multiply {ms:.3f} ms (wall {time.time()-t1:.0f}s)",
              flush=True)
        out["configs"][f"B{nb}_compact"] = {
            "avg_ms": round(ms, 3), "verified": ok,
            "stacked_rows": int(sop.op.plan.num_rows),
            "setup_compile_s": round(setup, 1)}
        del sop

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPLIT_COMPACT.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", dst, flush=True)


if __name__ == "__main__":
    main()
