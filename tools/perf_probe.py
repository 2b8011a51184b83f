#!/usr/bin/env python
"""Kernel phase attribution on real hardware with LIVE-output variants.

Round-1 section-skip timing dead-coded whole phases, which let XLA/Mosaic
reschedule around them — attribution was confounded (NOTES.md).  These
variants instead *shrink* a phase's work while keeping every phase's data
flow live, so the measured delta is the marginal cost of the shrunk work:

  base     — the production kernel (verified vs gold first)
  k1       — gather lists truncated to 1 visit/block (delta = marginal
             cost of (K-1) gather visits)
  span1    — row-phase unroll forced to 1 chunk visit (delta = marginal
             cost of (span-1) row visits)
  nocumsum — cumsum replaced by identity (existing debug_skip; products
             still feed the row phase)

Usage:  PYTHONPATH=.:$PYTHONPATH python tools/perf_probe.py [grid3d_n]
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
    from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas
    from merge_spmv_tpu.ops.gather_plan import (gather_meta_np,
                                                pack_tile_meta_np)
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    t0 = time.time()
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(n)).astype(np.float32)
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    print(f"matrix {csr.num_rows}x{csr.num_cols} nnz={csr.num_nonzeros} "
          f"({time.time()-t0:.0f}s)", flush=True)

    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype="float32",
                     row_end_offsets=csr.row_offsets[1:],
                     col_indices=csr.col_indices)
    v, re_, ci = csr.to_device(dtype=np.float32)
    cnt, lst = gather_meta_np(csr.col_indices, csr.num_nonzeros,
                              pad_blocks=(plan.tile_items + 1024) // 1024 + 1,
                              shift=10 if plan.meta_gran == 1024 else 7)
    _, tile_nnz = merge_tile_coordinates_np(csr.row_offsets[1:],
                                            csr.num_nonzeros,
                                            plan.tile_items)
    meta = jnp.asarray(pack_tile_meta_np(cnt, lst, tile_nnz,
                                         plan.tile_items))
    gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))

    def run_variant(name, p, m, skip="", verify=False):
        def step(xc):
            y = csrmv_pallas(p, v, re_, ci, xc, meta=m, debug_skip=skip)
            return xc + y[:p.num_cols] * 1e-20

        step = jax.jit(step)
        x = jnp.ones((p.num_cols,), jnp.float32)
        if verify:
            y = csrmv_pallas(p, v, re_, ci, x, meta=m, debug_skip=skip)
            ok = compare_results(np.asarray(y), gold, verbose=False) is None
            print(f"  verify: {'PASS' if ok else 'FAIL'}", flush=True)
        t0 = time.time()
        ms = chained_kernel_ms(step, x)
        gbps = (csr.num_nonzeros * 12 + csr.num_rows * 8) / ms / 1e6
        print(f"{name:>10}: {ms:8.4f} ms  {gbps:7.1f} GB/s eff  "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return ms

    print(plan.describe(), "meta_k", plan.meta_k, "row_span", plan.row_span,
          "r_win", plan.r_win, flush=True)

    base = run_variant("base", plan, meta, verify=True)

    # k1: truncate gather lists to a single visit per block
    cnt1 = np.minimum(cnt, 1)
    lst1 = lst[:, :1].copy()
    meta1 = jnp.asarray(pack_tile_meta_np(cnt1, lst1, tile_nnz,
                                          plan.tile_items))
    plan1 = dataclasses.replace(plan, meta_k=1)
    k1 = run_variant("k1", plan1, meta1)

    # span1: single row-phase chunk visit
    plan_s = dataclasses.replace(plan, row_span=1)
    s1 = run_variant("span1", plan_s, meta)

    # nocumsum
    nc = run_variant("nocumsum", plan, meta, skip="cumsum")

    K = plan.meta_k
    print(f"\nmarginal costs (grid3d{n}):")
    print(f"  gather {K-1} extra visits/block: {base-k1:8.4f} ms "
          f"({(base-k1)/max(K-1,1)*1000:6.1f} us/visit-rank)")
    print(f"  row-phase {plan.row_span-1} extra visits: {base-s1:8.4f} ms")
    print(f"  cumsum: {base-nc:8.4f} ms")
    print(f"  residual floor (k1&span1&nocumsum-ish): "
          f"{base - (base-k1) - (base-s1) - (base-nc):8.4f} ms")


if __name__ == "__main__":
    main()
