#!/usr/bin/env python
"""Skew-invariance measurement: power-law vs uniform at equal nnz.

The merge-path brand is row-length-skew immunity (paper Fig. 9a:
GPU correlation to row-CoV ≈ −0.01; BASELINE.md target: power-law within
~10 % of uniform).  Round 1 measured 0.4–0.7×; the round-2 kernel skips
inactive products chunks / row groups at runtime, which is the suspected
fix.  Writes SKEW.json.

    PYTHONPATH=.:$PYTHONPATH python tools/bench_skew.py [n] [deg]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_kernel_ms  # noqa: E402  (repo-root bench.py)


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()   # warm-page reuse for plan-time numpy
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nnz = n * deg
    rs = np.random.RandomState(0)

    def bench_one(label, coo):
        csr = CsrMatrix.from_coo(coo).astype(np.float32)
        csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros
                                ).astype(np.float32)
        x = jnp.ones((csr.num_cols,), jnp.float32)
        t0 = time.time()
        op = build_operator(csr, dtype="float32")
        y = op(x)
        jax.block_until_ready(y)
        gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))
        bound = csr.spmv_abs_bound(np.ones(csr.num_cols, np.float32))
        ok = compare_results(np.asarray(y), gold, verbose=False,
                             abs_bound=bound) is None

        step = jax.jit(lambda xc: xc + op(xc)[:csr.num_cols] * 1e-20)
        ms = chained_kernel_ms(step, x)
        gflops = 2 * csr.num_nonzeros / ms / 1e6
        stats = csr.stats()
        print(f"{label:>10}: {ms:8.4f} ms  {gflops:6.2f} GFLOP/s  "
              f"CoV={stats.row_length_variation:.2f} "
              f"verified={ok} plan_backend={op.plan.backend} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return {"avg_ms": round(ms, 4), "gflops": round(gflops, 2),
                "row_cov": round(float(stats.row_length_variation), 3),
                "verified": ok, "nnz": csr.num_nonzeros}

    out = {"metric": "skew_invariance_powerlaw_vs_uniform", "rows": n}
    # uniform degree (CoV ~ 0) with local columns — the favorable case
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols_u = np.clip(rows + rs.randint(-2048, 2048, rows.size), 0, n - 1)
    out["uniform"] = bench_one("uniform", CooMatrix(
        n, n, rows, cols_u, np.ones(rows.size)))

    # power-law row degrees, same nnz, same column locality model
    raw = rs.pareto(1.6, n) + 1.0
    degs = np.maximum(1, (raw * (nnz / raw.sum())).astype(np.int64))
    rows_p = np.repeat(np.arange(n, dtype=np.int64), degs)
    cols_p = np.clip(rows_p + rs.randint(-2048, 2048, rows_p.size),
                     0, n - 1)
    out["powerlaw"] = bench_one("powerlaw", CooMatrix(
        n, n, rows_p, cols_p, np.ones(rows_p.size)))

    # wheel: the adversarial single-hub case (sized so x stays
    # VMEM-resident — a wheel hub touches every column, so the streaming
    # window cannot apply; 2M spokes = 8 MB x)
    out["wheel"] = bench_one("wheel", CooMatrix.wheel(min(nnz // 2,
                                                          2_000_000)))

    r = out["powerlaw"]["gflops"] / max(out["uniform"]["gflops"], 1e-9)
    # normalize per-nnz (powerlaw nnz differs slightly from target)
    r *= out["uniform"]["nnz"] / out["powerlaw"]["nnz"]
    out["powerlaw_over_uniform_per_nnz"] = round(r, 3)
    print(json.dumps({"powerlaw_over_uniform_per_nnz": out[
        "powerlaw_over_uniform_per_nnz"]}))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
