#!/usr/bin/env python
"""Hot/cold popularity split A/B on a kron-class (RMAT) matrix, fp32.

The gather ladder's adversary: power-law degrees BOTH ways, globally
scattered columns (SURVEY §2 kron_g500 row).  Measures the default
merge operator, then the hot/cold split, on the same matrix; writes
BENCH_HOTCOLD.json.  Run on the TPU host AFTER the main queue (never
overlap TPU jobs):

    PYTHONPATH=.:$PYTHONPATH python tools/bench_hotcold.py [scale] [nnz]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_kernel_ms  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_HOTCOLD.json")
CACHE = "/tmp/kron_fp32_cache.npz"


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.ops.split import build_hotcold_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.device import peak_hbm_bandwidth
    from merge_spmv_tpu.utils.timers import (hotcold_operator_step_fn,
                                             operator_step_fn)

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000

    t0 = time.time()
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        csr = CsrMatrix(int(d["m"]), int(d["n"]), d["ro"], d["ci"], d["v"])
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_baseline_configs import rmat
        r_, c_, v_ = rmat(scale, nnz, 16, np.float32)
        nmax = int(max(r_.max(), c_.max())) + 1
        csr = CsrMatrix.from_coo(CooMatrix(nmax, nmax, r_, c_, v_)
                                 ).astype(np.float32)
        np.savez(CACHE, m=csr.num_rows, n=csr.num_cols,
                 ro=csr.row_offsets, ci=csr.col_indices, v=csr.values)
    print(f"kron-class {csr.num_rows}x{csr.num_cols} "
          f"nnz={csr.num_nonzeros} ({time.time()-t0:.0f}s)", flush=True)

    rs = np.random.RandomState(1)
    x = rs.uniform(0.5, 1.5, csr.num_cols).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    xd = jnp.asarray(x)
    total_bytes = csr.num_nonzeros * 12 + csr.num_rows * 8
    peak = peak_hbm_bandwidth()
    out = {"metric": "kron_class_hotcold_ab_fp32", "rows": csr.num_rows,
           "nnz": csr.num_nonzeros}

    # baseline: default merge operator (no preprocessing)
    t0 = time.time()
    op = build_operator(csr, dtype="float32")
    y = op(xd)
    jax.block_until_ready(y)
    ok = compare_results(np.asarray(y), gold, verbose=True,
                         abs_bound=bound) is None
    ms = chained_kernel_ms(operator_step_fn(op), xd, n=6, reps=3)
    gbps = total_bytes / ms / 1e6
    print(f"merge:   {ms:.3f} ms  {gbps:.1f} GB/s "
          f"({100*gbps/peak:.1f}% peak) verify={'PASS' if ok else 'FAIL'} "
          f"plan={op.plan.describe()} (setup+compile {time.time()-t0:.0f}s)",
          flush=True)
    out["merge"] = {"avg_ms": round(ms, 3),
                    "effective_gbps": round(gbps, 1), "verified": ok}
    del op

    # hot/cold split
    t0 = time.time()
    hop = build_hotcold_operator(csr, dtype="float32")
    print(hop.describe(), flush=True)
    if hop.num_hot_windows == 0:
        out["hotcold"] = {"declined": True}
    else:
        y2 = hop(xd)
        jax.block_until_ready(y2)
        ok2 = compare_results(np.asarray(y2), gold, verbose=True,
                              abs_bound=bound) is None
        ms2 = chained_kernel_ms(hotcold_operator_step_fn(hop), xd,
                                n=6, reps=3)
        gbps2 = total_bytes / ms2 / 1e6
        print(f"hotcold: {ms2:.3f} ms  {gbps2:.1f} GB/s "
              f"({100*gbps2/peak:.1f}% peak) "
              f"verify={'PASS' if ok2 else 'FAIL'} "
              f"(setup+compile {time.time()-t0:.0f}s)", flush=True)
        out["hotcold"] = {"avg_ms": round(ms2, 3),
                          "effective_gbps": round(gbps2, 1),
                          "verified": ok2,
                          "hot_windows": hop.num_hot_windows,
                          "hot_nnz": hop.hot_nnz,
                          "cold_nnz": hop.cold_nnz,
                          "split_setup_ms": round(hop.setup_ms, 0)}
        out["hotcold_speedup"] = round(ms / ms2, 2)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
