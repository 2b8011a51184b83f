#!/usr/bin/env python
"""Phase attribution for the stacked-band split multiply (circuit class).

The split multiply processes nb*m_pad stacked rows + ~nnz items; whether
the remaining time is the ROW phase (merge row windows over the stacked
row explosion) or the GATHER (per-block chunk visits) decides the next
optimization (compact per-band rows vs narrower bands).  Variants use
the same live-output debug_skip shrinks as tools/perf_probe.py:

  base     — the split's prepared kernel, verified
  norows   — row phase off (output wrong; delta = row-phase share)
  nogather — gather serves cols as values (delta = gather share)
  nocumsum — cumsum identity

Usage: PYTHONPATH=. python tools/split_phase_probe.py [n nnz bands]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()
    import bench_large as bl
    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.split import build_split_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import ingraph_rate_ms

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_389_581
    nnz = int(args[1]) if len(args) > 1 else 14_881_072
    nb = int(args[2]) if len(args) > 2 else 16

    t0 = time.time()
    r_, c_, v_ = bl.make_circuit_like(n, nnz)
    csr = CsrMatrix.from_coo(CooMatrix(n, n, r_, c_, v_)).astype(np.float32)
    print(f"matrix {csr.num_rows} nnz={csr.num_nonzeros} "
          f"({time.time()-t0:.0f}s)", flush=True)
    x = np.random.RandomState(1).uniform(0.1, 1.0, n).astype(np.float32)
    gold = csr.spmv_gold(x)

    sop = build_split_operator(csr, dtype="float32", edges_chunks="quantile",
                               num_bands=nb)
    op = sop.op
    plan = op.plan
    print("split plan:", plan.describe(), "stacked_rows:", plan.num_rows,
          flush=True)
    xd = jnp.asarray(x)
    y = sop(xd)
    ok = compare_results(np.asarray(y), gold, verbose=False) is None
    print("verify:", "PASS" if ok else "FAIL", flush=True)

    from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call
    prep = op._prep
    arrs = (prep.values_p, prep.cols_p, prep.rowends_p, prep.tile_rows,
            prep.tile_nnz, prep.cbase, prep.meta, prep.tile_flags)
    if prep.rowmeta is not None:
        arrs = arrs + (prep.rowmeta,)

    res = {}
    for name, skip in (("base", ""), ("norows", "rows"),
                       ("nogather", "gather"), ("nocumsum", "cumsum")):
        @jax.jit
        def raw(xc, *a, skip=skip):
            from merge_spmv_tpu.ops.csrmv_pallas import PreparedCsrmv
            p2 = PreparedCsrmv(a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                               meta_is_list=prep.meta_is_list,
                               tile_flags=a[7],
                               rowmeta=a[8] if len(a) > 8 else None)
            # a[6] = meta, a[7] = tile_flags (PreparedCsrmv field order;
            # swapping them fed the FULL meta array through the
            # scalar-prefetch slot and blew the 1 MiB SMEM)
            # feed the stacked x the split op builds (band-invariant)
            yk = _prepared_call(
                plan, p2.values_p, p2.cols_p, p2.rowends_p, p2.tile_rows,
                p2.tile_nnz, p2.cbase, p2.tile_flags, p2.meta, xc, None,
                jnp.float32(1.0), jnp.float32(0.0), p2.rowmeta,
                meta_is_list=prep.meta_is_list, alpha_one=True,
                interpret=False, debug_skip=skip)
            return xc + yk[:plan.num_cols] * 1e-20

        step = lambda xc, raw=raw: raw(xc, *arrs)   # noqa: E731
        step.raw, step.args = raw, arrs
        t1 = time.time()
        ms = ingraph_rate_ms(step, xd, steps=16)
        res[name] = round(ms, 3)
        print(f"{name:>9}: {ms:8.3f} ms  (wall {time.time()-t1:.0f}s)",
              flush=True)
    if "base" in res:
        for k, v in res.items():
            if k != "base":
                print(f"  {k}: delta {res['base'] - v:+.3f} ms")
    out = {"matrix": f"circuit_like n={n} nnz={csr.num_nonzeros}",
           "bands": nb, "stacked_rows": plan.num_rows,
           "variants_ms": res, "timing": "ingraph"}
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPLIT_PHASE_PROBE.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", dst)


if __name__ == "__main__":
    main()
