#!/usr/bin/env python
"""Device-side split setup vs the host path on the circuit5M class.

Round-4 host numbers (BENCH_LARGE.json): split B=16 multiply 69 ms but
setup 69 s — three orders worse than the reference's on-GPU HYB
conversion (1.06 s, README.md:144).  build_split_operator_device moves
every nonzero-scale pass onto the chip; this tool measures the setup
wall time (blocking), verifies against gold, times the multiply with the
in-graph chain, and merges a "split_device" section into
BENCH_LARGE.json.

    PYTHONPATH=. python tools/split_device_bench.py [scale] [num_bands]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_LARGE.json")


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.split import build_split_operator_device
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import (ingraph_rate_ms,
                                             split_operator_step_fn)

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_large as bl
    # same target as tools/bench_large.py (yields 56.7M actual nnz at
    # scale 1 after the max(1, deg) truncation) so split_device is
    # apples-to-apples with the BENCH_LARGE rows
    n = int(5_558_326 * scale)
    nnz = int(59_524_291 * scale)
    t0 = time.perf_counter()
    r_, c_, v_ = bl.make_circuit_like(n, nnz)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, r_, c_, v_)).astype(np.float32)
    print(f"matrix built in {time.perf_counter()-t0:.0f}s "
          f"({csr.num_rows} rows, {csr.num_nonzeros} nnz)", flush=True)
    x = np.random.RandomState(1).uniform(0.5, 1.5, csr.num_cols
                                         ).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)

    # build TWICE: the first pays the one-time-per-shape remote compiles
    # of the conversion stages (on a real TPU host these are local,
    # seconds, and cached per shape class like the reference's
    # precompiled cuSPARSE conversion kernels); the second is the
    # conversion cost itself — jit caches hit, device work only.
    sop = build_split_operator_device(csr, num_bands=nb)
    first_ms = sop.setup_ms
    sop = build_split_operator_device(csr, num_bands=nb)
    print(f"device split setup: {sop.setup_ms:.0f} ms "
          f"(upload {sop.upload_ms:.0f} + convert {sop.convert_ms:.0f}; "
          f"+{(first_ms - sop.setup_ms)/1e3:.0f} s one-time stage "
          f"compiles; {sop.num_bands} bands, plan {sop.plan.describe()})",
          flush=True)
    print(f"stage attribution: {sop.stage_ms}", flush=True)

    xd = jnp.asarray(x)
    y = sop(xd)
    jax.block_until_ready(y)
    ok = compare_results(np.asarray(y), gold, verbose=True,
                         abs_bound=bound) is None
    print(f"verify: {'PASS' if ok else 'FAIL'}", flush=True)

    ms = ingraph_rate_ms(split_operator_step_fn(sop), xd, steps=8)
    total_bytes = csr.num_nonzeros * 12 + csr.num_rows * 8
    gbps = total_bytes / ms / 1e6
    gflops = 2 * csr.num_nonzeros / ms / 1e6
    print(f"{ms:.3f} ms  {gflops:.2f} GFLOP/s  {gbps:.1f} GB/s eff",
          flush=True)

    rec = {"avg_ms": round(ms, 3), "gflops": round(gflops, 2),
           "effective_gbps": round(gbps, 1), "verified": ok,
           "num_bands": sop.num_bands, "edges": "quantile(device)",
           "split_setup_ms": round(sop.setup_ms, 0),
           "upload_ms": round(sop.upload_ms, 0),
           "convert_ms": round(sop.convert_ms, 0),
           "stage_compile_s": round((first_ms - sop.setup_ms) / 1e3, 1),
           "timing": "ingraph"}
    if scale == 1.0 and os.path.exists(OUT):
        data = json.load(open(OUT))
        data["split_device"] = rec
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1); f.write("\n")
        print(f"merged split_device into {OUT}", flush=True)
    else:
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
