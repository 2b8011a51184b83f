#!/usr/bin/env python
"""Skew attribution probe: where do the powerlaw-vs-uniform cycles go?

Variants on the power-law matrix (same column model as bench_skew.py):
  skip      — production plan (runtime_skip=True, cb=8, gq=4)
  coarse    — fewer branch boundaries (cb=16, gq=8)
  coarser   — cb=32, gq=16
  noskip    — runtime_skip=False (monolithic kernel, full static shapes)
Prints uniform first as the denominator.

    PYTHONPATH=.:$PYTHONPATH python tools/skew_probe.py [n] [deg]
"""

import dataclasses
import sys
import time


def chained_kernel_ms(step, x0, n=30, reps=5):
    import numpy as np

    xc = x0
    for _ in range(4):
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


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.csrmv_pallas import (csrmv_pallas_prepared,
                                                 prepare_csrmv)
    from merge_spmv_tpu.ops.operator import _build_packed_meta
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nnz = n * deg
    rs = np.random.RandomState(0)

    def build_csr(powerlaw):
        if powerlaw:
            raw = rs.pareto(1.6, n) + 1.0
            degs = np.maximum(1, (raw * (nnz / raw.sum())).astype(np.int64))
            rows = np.repeat(np.arange(n, dtype=np.int64), degs)
        else:
            rows = np.repeat(np.arange(n, dtype=np.int64), deg)
        cols = np.clip(rows + rs.randint(-2048, 2048, rows.size), 0, n - 1)
        csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols,
                                           np.ones(rows.size))
                                 ).astype(np.float32)
        csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros
                                ).astype(np.float32)
        return csr

    def run(label, csr, gold, k_trunc=0, **plan_over):
        plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                         dtype="float32",
                         row_end_offsets=csr.row_offsets[1:],
                         col_indices=csr.col_indices)
        if plan_over:
            plan = dataclasses.replace(plan, **plan_over)
        if k_trunc and plan.meta_k > k_trunc:
            # timing-only attribution: truncated gather lists produce
            # WRONG results; measures the cost of the list tail
            from merge_spmv_tpu.ops.gather_plan import (gather_meta_np,
                                                        pack_tile_meta_np)
            from merge_spmv_tpu.ops.merge_path import \
                merge_tile_coordinates_np
            cnt, lst = gather_meta_np(
                csr.col_indices, csr.num_nonzeros,
                pad_blocks=(plan.tile_items + 1024) // 1024 + 1,
                shift=10 if plan.meta_gran == 1024 else 7)
            cnt = np.minimum(cnt, k_trunc)
            lst = lst[:, :k_trunc].copy()
            plan = dataclasses.replace(plan, meta_k=k_trunc)
            _, tile_nnz = merge_tile_coordinates_np(
                csr.row_offsets[1:], csr.num_nonzeros, plan.tile_items)
            import jax.numpy as _jnp
            meta = _jnp.asarray(pack_tile_meta_np(cnt, lst, tile_nnz,
                                                  plan.tile_items))
        else:
            meta = _build_packed_meta(plan, csr.row_offsets[1:],
                                      csr.col_indices)
        v, re_, ci = csr.to_device(dtype=np.float32)
        prep = prepare_csrmv(plan, v, re_, ci, meta=meta)
        y = csrmv_pallas_prepared(plan, prep, jnp.ones((csr.num_cols,),
                                                       jnp.float32))
        bound = csr.spmv_abs_bound(np.ones(csr.num_cols, np.float32))
        ok = compare_results(np.asarray(y), gold, verbose=False,
                             abs_bound=bound) is None

        def step(xc):
            yc = csrmv_pallas_prepared(plan, prep, xc)
            return xc + yc[:plan.num_cols] * 1e-20

        ms = chained_kernel_ms(jax.jit(step),
                               jnp.ones((csr.num_cols,), jnp.float32))
        per_nnz = ms * 1e6 / csr.num_nonzeros
        print(f"{label:>9}: {ms:8.4f} ms  {per_nnz:6.3f} ns/nnz  "
              f"skip={plan.runtime_skip} K={plan.meta_k}@{plan.meta_gran} "
              f"span={plan.row_span} r_win={plan.r_win} "
              f"tiles={plan.num_tiles} verified={ok}", flush=True)
        return ms / csr.num_nonzeros

    t0 = time.time()
    csr_u = build_csr(False)
    gold_u = csr_u.spmv_gold(np.ones(n, np.float32))
    print(f"uniform built ({time.time()-t0:.0f}s)", flush=True)
    u = run("uniform", csr_u, gold_u)
    del csr_u

    t0 = time.time()
    csr_p = build_csr(True)
    gold_p = csr_p.spmv_gold(np.ones(n, np.float32))
    print(f"powerlaw built ({time.time()-t0:.0f}s)", flush=True)
    which = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "base", "ktrunc", "span1"]
    res = {}
    if "base" in which:
        res["base"] = run("base", csr_p, gold_p)
    if "ktrunc" in which:
        # timing-only: how much do the gather-list tail visits cost?
        res["ktrunc"] = run("ktrunc", csr_p, gold_p, k_trunc=6)
    if "span1" in which:
        # timing-only: how much does the row-phase span cost?
        res["span1"] = run("span1", csr_p, gold_p, row_span=1)
    if "skip" in which:
        res["skip"] = run("skip", csr_p, gold_p, runtime_skip=True)
    if "noskip" in which:
        res["noskip"] = run("noskip", csr_p, gold_p, runtime_skip=False)
    for k, v in res.items():
        print(f"  {k}: per-nnz ratio vs uniform = {u / v:.3f}")


if __name__ == "__main__":
    main()
