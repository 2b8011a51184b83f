#!/usr/bin/env python
"""SpMM benchmark: per-column csrvm loop (the general path) vs the DIA
split (the structured path).

The multi-RHS "wide" kernel is RETIRED (round 4): two independent designs
both measured ~0.3x the column loop on chip — per-visit gather cost does
not amortize over k on this hardware (round-3 BENCH_SPMM.json, NOTES.md).
The advertised SpMM surface is operator.mm (column loop) with the
suggester routing stencil/banded matrices to the DIA operator.
Writes BENCH_SPMM.json.

    PYTHONPATH=.:$PYTHONPATH python tools/bench_spmm.py [grid3d_n] [k]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merge_spmv_tpu.utils.timers import ingraph_rate_ms  # noqa: E402


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.csrmv_pallas import csrmm_column_loop
    from merge_spmv_tpu.ops.operator import _build_packed_meta
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results

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
    out = {"metric": "spmm_column_loop_vs_dia", "rows": csr.num_rows,
           "nnz": csr.num_nonzeros, "k": k,
           "wide_kernel": "retired round 4: ~0.3x the column loop across "
                          "two on-chip designs (round-3 BENCH_SPMM.json)"}
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

    ms_c = ingraph_rate_ms(jax.jit(step_c), Xd, steps=16)
    gf_c = 2 * k * csr.num_nonzeros / ms_c / 1e6
    print(f"column: {ms_c:8.3f} ms  {gf_c:7.1f} GFLOP/s  "
          f"({'PASS' if ok2 else 'FAIL'})", flush=True)
    out["column_loop"] = {"avg_ms": round(ms_c, 3),
                          "gflops": round(gf_c, 1), "verified": ok2}

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

            sd = lambda xc: step_d(xc, vt)   # noqa: E731
            sd.raw, sd.args = step_d, (vt,)
            ms_d = ingraph_rate_ms(sd, Xd, steps=64)
            gf_d = 2 * k * csr.num_nonzeros / ms_d / 1e6
            # actual DIA traffic (vtab + X + Y), NOT the CSR-equivalent
            # model (bytesM) — the latter exceeds physical HBM peak for a
            # format that reads no indices and re-reads no x
            dia_bytes = (vt.size + (m + lp + rp) * k + m * k) * 4
            gbps_d = dia_bytes / ms_d / 1e6
            print(f"dia:    {ms_d:8.3f} ms  {gf_d:7.1f} GFLOP/s  "
                  f"{gbps_d:6.1f} GB/s actual "
                  f"({'PASS' if ok3 else 'FAIL'}, D={len(offs)}, "
                  f"setup {time.time()-t0:.0f}s)", flush=True)
            out["dia"] = {"avg_ms": round(ms_d, 3),
                          "gflops": round(gf_d, 1),
                          "actual_gbps": round(gbps_d, 1), "verified": ok3,
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
