"""Diagnose the bench.py 2^19-row skew pair (run on TPU).

BENCH_r03 read powerlaw/uniform per-nnz = 0.822 (< 0.9 target) at 2^19
rows while SKEW.json reads 0.942 at 2^20 — the paper's property (Fig. 9a)
is scale-free, so something in the plan ladder is shape-dependent.  This
probe rebuilds exactly the bench.py pair and times each matrix under
runtime_skip auto/False/True so the regression can be attributed to the
branchy-kernel decision (ops/plan.py rs_auto) or to the kernel itself.

Usage: python tools/skew_diag.py [log2_rows]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from merge_spmv_tpu.utils.hostmem import enable_warm_heap  # noqa: E402

enable_warm_heap()

import numpy as np  # noqa: E402


def build_pair(nk, deg=8, seed=0):
    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix

    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(nk, dtype=np.int64), deg)
    cols = np.clip(rows + rs.randint(-2048, 2048, rows.size), 0, nk - 1)
    csr_u = CsrMatrix.from_coo(
        CooMatrix(nk, nk, rows, cols, np.ones(rows.size))).astype(np.float32)
    raw = rs.pareto(1.6, nk) + 1.0
    degs = np.maximum(1, (raw * (nk * deg / raw.sum())).astype(np.int64))
    rows_p = np.repeat(np.arange(nk, dtype=np.int64), degs)
    cols_p = np.clip(rows_p + rs.randint(-2048, 2048, rows_p.size),
                     0, nk - 1)
    csr_p = CsrMatrix.from_coo(
        CooMatrix(nk, nk, rows_p, cols_p, np.ones(rows_p.size))
    ).astype(np.float32)
    return csr_u, csr_p


def main():
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import ingraph_rate_ms, operator_step_fn

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    nk = 1 << lg
    csr_u, csr_p = build_pair(nk)
    out = {"rows": nk}
    for name, csr in (("uniform", csr_u), ("powerlaw", csr_p)):
        x = np.ones(csr.num_cols, np.float32)
        gold = csr.spmv_gold(x)
        xd = jnp.asarray(x)
        for rs_knob, clu in ((None, False), (False, False), (True, False),
                             (False, True)):
            key = (f"{name}_rs{'auto' if rs_knob is None else rs_knob}"
                   + ("_cluster" if clu else ""))
            t0 = time.time()
            try:
                op = build_operator(csr, dtype="float32",
                                    runtime_skip=rs_knob,
                                    gather_cluster=clu)
                y = op(xd)
                jax.block_until_ready(y)
                ok = compare_results(np.asarray(y), gold) is None
                ms = ingraph_rate_ms(operator_step_fn(op), xd, steps=256)
                out[key] = {
                    "ms": round(ms, 4), "ok": ok,
                    "runtime_skip": op.plan.runtime_skip,
                    "r_win": op.plan.r_win, "K": op.plan.meta_k,
                    "row_meta_k": op.plan.row_meta_k,
                    "row_span": op.plan.row_span,
                    "tiles": op.plan.num_tiles,
                    "cluster": list(op.plan.cluster_spans),
                    "nnz": csr.num_nonzeros,
                }
                print(f"{key}: {out[key]} ({time.time()-t0:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                out[key] = {"error": str(e)[:200]}
                print(f"{key}: FAILED {str(e)[:200]}", flush=True)
    # per-nnz ratios for every knob setting
    for rs_knob in ("rsauto", "rsFalse", "rsTrue", "rsFalse_cluster"):
        u, p = out.get(f"uniform_{rs_knob}"), out.get(f"powerlaw_{rs_knob}")
        if u and p and "ms" in u and "ms" in p:
            out[f"ratio_{rs_knob}"] = round(
                (u["ms"] / u["nnz"]) / (p["ms"] / p["nnz"]), 3)
    print(json.dumps(out))
    with open("/tmp/skew_diag.json", "w") as f:
        json.dump(out, f)
        f.write("\n")


if __name__ == "__main__":
    main()
