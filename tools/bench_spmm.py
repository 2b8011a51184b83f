#!/usr/bin/env python
"""SpMM benchmark: wide multi-RHS kernel vs the per-column csrmv loop.

VERDICT #6 done-criterion: csrmm at k=32 ≥10× the per-column loop,
verified on-chip.  Writes BENCH_SPMM.json.

    PYTHONPATH=.:$PYTHONPATH python tools/bench_spmm.py [grid3d_n] [k]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_kernel_ms  # noqa: E402


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.csrmm_pallas import (csrmm_wide_prepared,
                                                 make_mm_plan, prepare_csrmm)
    from merge_spmv_tpu.ops.csrmv_pallas import csrmm_column_loop
    from merge_spmv_tpu.ops.operator import _build_packed_meta
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.device import peak_hbm_bandwidth

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    csr = CsrMatrix.from_coo(CooMatrix.grid3d(n)).astype(np.float32)
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    X = rs.uniform(0.5, 1.5, (csr.num_cols, k)).astype(np.float32)
    print(f"grid3d{n}: {csr.num_rows} rows, {csr.num_nonzeros} nnz, k={k}",
          flush=True)
    gold = csr.spmm_gold(X)
    bound = np.abs(csr.to_dense()) @ np.abs(X) if csr.num_rows <= 4096 \
        else None
    Xd = jnp.asarray(X)
    out = {"metric": "spmm_wide_vs_column_loop", "rows": csr.num_rows,
           "nnz": csr.num_nonzeros, "k": k}
    bytesM = (csr.num_nonzeros * (4 * (1 + k) + 4)
              + csr.num_rows * (4 + 4 * k))

    # wide kernel
    t0 = time.time()
    plan = make_mm_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros, k,
                        row_end_offsets=csr.row_offsets[1:],
                        col_indices=csr.col_indices)
    meta = _build_packed_meta(plan, csr.row_offsets[1:], csr.col_indices)
    prep = prepare_csrmm(plan, *csr.to_device(dtype=np.float32), meta=meta)
    Y = csrmm_wide_prepared(plan, prep, Xd)
    jax.block_until_ready(Y)
    ok = compare_results(np.asarray(Y), gold, verbose=True,
                         abs_bound=bound) is None
    print(f"wide verify: {'PASS' if ok else 'FAIL'} "
          f"(T={plan.tile_items}, x_win={plan.x_win}, "
          f"setup {time.time()-t0:.0f}s)", flush=True)

    def step_w(xc):
        y = csrmm_wide_prepared(plan, prep, xc)
        return xc + y[:xc.shape[0]] * 1e-20

    ms_w = chained_kernel_ms(jax.jit(step_w), Xd, n=10, reps=3)
    gf_w = 2 * k * csr.num_nonzeros / ms_w / 1e6
    peak = peak_hbm_bandwidth()
    print(f"wide:   {ms_w:8.3f} ms  {gf_w:7.1f} GFLOP/s  "
          f"{bytesM/ms_w/1e6:6.1f} GB/s eff "
          f"({100*bytesM/ms_w/1e6/peak:.1f}% peak)", flush=True)
    out["wide"] = {"avg_ms": round(ms_w, 3), "gflops": round(gf_w, 1),
                   "verified": ok}

    # per-column csrmv loop (round-1 state)
    plan_c = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                       dtype="float32",
                       row_end_offsets=csr.row_offsets[1:],
                       col_indices=csr.col_indices)
    meta_c = _build_packed_meta(plan_c, csr.row_offsets[1:],
                                csr.col_indices)
    v, re_, ci = csr.to_device(dtype=np.float32)
    Y2 = csrmm_column_loop(plan_c, v, re_, ci, Xd, meta=meta_c)
    jax.block_until_ready(Y2)
    ok2 = compare_results(np.asarray(Y2), gold, verbose=False,
                          abs_bound=bound) is None

    def step_c(xc):
        y = csrmm_column_loop(plan_c, v, re_, ci, xc, meta=meta_c)
        return xc + y[:xc.shape[0]] * 1e-20

    ms_c = chained_kernel_ms(jax.jit(step_c), Xd, n=4, reps=2)
    gf_c = 2 * k * csr.num_nonzeros / ms_c / 1e6
    print(f"column: {ms_c:8.3f} ms  {gf_c:7.1f} GFLOP/s  "
          f"({'PASS' if ok2 else 'FAIL'})", flush=True)
    out["column_loop"] = {"avg_ms": round(ms_c, 3),
                          "gflops": round(gf_c, 1), "verified": ok2}
    out["wide_speedup"] = round(ms_c / ms_w, 1)
    print(json.dumps({"wide_speedup": out["wide_speedup"]}))

    # DIA split (opt-in structured path): grid3d is pure stencil, so
    # this measures the D-shifted-FMA SpMM ceiling on the same shape
    try:
        from merge_spmv_tpu.ops.dia import build_dia_operator
        t0 = time.time()
        dop = build_dia_operator(csr, dtype="float32")
        if dop.vtab is not None:
            Y3 = dop.mm(Xd)
            jax.block_until_ready(Y3)
            ok3 = compare_results(np.asarray(Y3), gold, verbose=False,
                                  abs_bound=bound) is None

            vt = dop.vtab
            offs = tuple(int(o) for o in dop.offsets)
            lp, rp = dop._lpad, dop._rpad
            m = dop.num_rows

            @jax.jit
            def step_d(xc, vt):
                Xp = jnp.pad(xc, ((lp, rp), (0, 0)))
                acc = jnp.zeros((m, xc.shape[1]), vt.dtype)
                for i, off in enumerate(offs):
                    s = lp + off
                    acc = acc + vt[i][:, None] * Xp[s:s + m]
                return xc + acc[:xc.shape[0]] * 1e-20

            ms_d = chained_kernel_ms(lambda xc: step_d(xc, vt), Xd,
                                     n=20, reps=3)
            gf_d = 2 * k * csr.num_nonzeros / ms_d / 1e6
            print(f"dia:    {ms_d:8.3f} ms  {gf_d:7.1f} GFLOP/s  "
                  f"{bytesM/ms_d/1e6:6.1f} GB/s eff "
                  f"({'PASS' if ok3 else 'FAIL'}, D={len(offs)}, "
                  f"setup {time.time()-t0:.0f}s)", flush=True)
            out["dia"] = {"avg_ms": round(ms_d, 3),
                          "gflops": round(gf_d, 1), "verified": ok3,
                          "diagonals": len(offs),
                          "setup_ms": round(dop.setup_ms, 0)}
    except Exception as e:  # noqa: BLE001
        print(f"dia spmm failed: {str(e)[:200]}", flush=True)
        out["dia"] = {"error": str(e)[:200]}

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SPMM.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
