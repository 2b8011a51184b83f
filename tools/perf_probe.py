#!/usr/bin/env python
"""Kernel phase attribution on real hardware with LIVE-output variants.

Round-1 section-skip timing dead-coded whole phases, which let XLA/Mosaic
reschedule around them — attribution was confounded (NOTES.md).  These
variants instead *shrink* a phase's work while keeping every phase's data
flow live, so the measured delta is the marginal cost of the shrunk work:

  base     — the production prepared-operator path (verified vs gold)
  k1       — gather lists truncated to 1 visit/block
  span1    — row-phase unroll forced to 1 chunk visit
  nocumsum — cumsum replaced by identity (debug_skip)
  floor    — all three shrinks together (DMA + 1-visit products + write)
  dynfetch — gather's dynamic sublane fetch pinned to a hoistable
             constant row (output wrong): base - dynfetch isolates the
             dynamic-fetch share of the per-visit cost
  cluster  — cluster-gather mode (one 8-row fetch per window cluster,
             roll-served visits; gather_plan.cluster_meta_np), verified
  T<n>     — tile-size sweep points on the base configuration

Usage:  PYTHONPATH=.:$PYTHONPATH python tools/perf_probe.py [grid3d_n] [variants]
        variants: comma list from base,k1,span1,nocumsum,floor,dynfetch,
        cluster,sweep
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
    from merge_spmv_tpu.ops.gather_plan import (gather_meta_np,
                                                pack_tile_meta_np)
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["base", "k1", "span1", "nocumsum", "floor", "sweep"])
    t0 = time.time()
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(n)).astype(np.float32)
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    print(f"matrix {csr.num_rows}x{csr.num_cols} nnz={csr.num_nonzeros} "
          f"({time.time()-t0:.0f}s)", flush=True)
    gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))

    def build(tile_items=None, k1=False, cluster=False):
        plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                         dtype="float32", tile_items=tile_items,
                         row_end_offsets=csr.row_offsets[1:],
                         col_indices=csr.col_indices,
                         gather_cluster=cluster,
                         runtime_skip=False if cluster else None)
        v, re_, ci = csr.to_device(dtype=np.float32)
        if cluster:
            if not plan.cluster_widths:
                raise RuntimeError("cluster cover unavailable")
            from merge_spmv_tpu.ops.operator import _build_packed_meta
            meta = _build_packed_meta(plan, csr.row_offsets[1:],
                                      csr.col_indices)
            return plan, prepare_csrmv(plan, v, re_, ci, meta=meta)
        cnt, lst = gather_meta_np(
            csr.col_indices, csr.num_nonzeros,
            pad_blocks=(plan.tile_items + 1024) // 1024 + 1,
            shift=10 if plan.meta_gran == 1024 else 7)
        if k1:
            cnt = np.minimum(cnt, 1)
            lst = lst[:, :1].copy()
            plan = dataclasses.replace(plan, meta_k=1)
        _, tile_nnz = merge_tile_coordinates_np(csr.row_offsets[1:],
                                               csr.num_nonzeros,
                                               plan.tile_items)
        meta = jnp.asarray(pack_tile_meta_np(cnt, lst, tile_nnz,
                                             plan.tile_items))
        return plan, prepare_csrmv(plan, v, re_, ci, meta=meta)

    def run_variant(name, plan, prep, skip="", verify=False):
        from merge_spmv_tpu.ops.csrmv_pallas import PreparedCsrmv
        from merge_spmv_tpu.utils.timers import ingraph_rate_ms

        arrs = (prep.values_p, prep.cols_p, prep.rowends_p, prep.tile_rows,
                prep.tile_nnz, prep.cbase, prep.meta, prep.tile_flags)
        if prep.rowmeta is not None:
            arrs = arrs + (prep.rowmeta,)

        @jax.jit
        def raw(xc, *a):
            p2 = PreparedCsrmv(a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                               meta_is_list=prep.meta_is_list,
                               tile_flags=a[7],
                               rowmeta=a[8] if len(a) > 8 else None)
            y = csrmv_pallas_prepared(plan, p2, xc, debug_skip=skip)
            return xc + y[:plan.num_cols] * 1e-20

        step = lambda xc: raw(xc, *arrs)   # noqa: E731
        step.raw, step.args = raw, arrs
        x = jnp.ones((plan.num_cols,), jnp.float32)
        if verify:
            y = csrmv_pallas_prepared(plan, prep, x, debug_skip=skip)
            ok = compare_results(np.asarray(y), gold, verbose=False) is None
            print(f"  verify: {'PASS' if ok else 'FAIL'}", flush=True)
        t0 = time.time()
        ms = ingraph_rate_ms(step, x)
        gbps = (csr.num_nonzeros * 12 + csr.num_rows * 8) / ms / 1e6
        print(f"{name:>12}: {ms:8.4f} ms  {gbps:7.1f} GB/s eff  "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return ms

    plan, prep = build()
    print(plan.describe(), "meta_k", plan.meta_k, "row_span", plan.row_span,
          "r_win", plan.r_win, flush=True)

    res = {}
    if "base" in which:
        res["base"] = run_variant("base", plan, prep, verify=True)
    if "k1" in which:
        plan1, prep1 = build(k1=True)
        res["k1"] = run_variant("k1", plan1, prep1)
    if "span1" in which:
        plan_s = dataclasses.replace(plan, row_span=1)
        res["span1"] = run_variant("span1", plan_s, prep)
    if "nocumsum" in which:
        res["nocumsum"] = run_variant("nocumsum", plan, prep, skip="cumsum")
    if "dynfetch" in which:
        res["dynfetch"] = run_variant("dynfetch", plan, prep,
                                      skip="dynfetch")
    def build_op(**kw):
        from merge_spmv_tpu.ops.operator import build_operator
        op = build_operator(csr, dtype="float32", **kw)
        return op.plan, op._prep

    for v in list(which):
        # glist<G> / gtree<G>: grouped union window lists — ONE dynamic
        # fetch per union visit serves G consecutive blocks.  The
        # VPU_CEILING probe measured dynamic sublane fetches at ~12x a
        # static access, so cutting fetched sublanes per block from K to
        # ~K_G/G is the predicted win.
        if v.startswith("glist") or v.startswith("gtree"):
            G = int(v[5:])
            try:
                planG, prepG = build_op(gather_group=G, gather_cluster=False)
                if planG.gather_group != G:
                    print(f"{v}: plan demoted gather_group to "
                          f"{planG.gather_group}", flush=True)
                    continue
                if v.startswith("gtree"):
                    planG = dataclasses.replace(planG, gather_style="tree")
                print(f"{v}: union K_G = {planG.meta_k}", flush=True)
                res[v] = run_variant(v, planG, prepG, verify=True)
            except Exception as e:  # noqa: BLE001
                print(f"{v}: failed ({str(e)[:160]})", flush=True)
    if "tree" in which:
        plan_t = dataclasses.replace(plan, gather_style="tree")
        res["tree"] = run_variant("tree", plan_t, prep, verify=True)
    if "stage" in which:
        plan_g = dataclasses.replace(plan, gather_style="stage")
        res["stage"] = run_variant("stage", plan_g, prep, verify=True)
    if "ctree" in which:
        try:
            planc2, prepc2 = build(cluster=True)
            planct = dataclasses.replace(planc2, gather_style="tree")
            res["ctree"] = run_variant("ctree", planct, prepc2, verify=True)
        except Exception as e:  # noqa: BLE001
            print(f"ctree: failed ({str(e)[:160]})", flush=True)
    if "cluster" in which:
        try:
            planc, prepc = build(cluster=True)
            print("cluster widths:", planc.cluster_widths, flush=True)
            res["cluster"] = run_variant("cluster", planc, prepc,
                                         verify=True)
        except Exception as e:  # noqa: BLE001
            print(f"cluster: failed ({str(e)[:160]})", flush=True)
    if "floor" in which:
        plan1, prep1 = build(k1=True)
        planf = dataclasses.replace(plan1, row_span=1)
        res["floor"] = run_variant("floor", planf, prep1, skip="cumsum")
    if "sweep" in which:
        tiles = [int(t) for t in sys.argv[3].split(",")] if len(sys.argv) > 3 \
            else [98304, 131072]
        for T in tiles:
            try:
                planT, prepT = build(tile_items=T)
                res[f"T{T}"] = run_variant(f"T{T}", planT, prepT, verify=True)
            except Exception as e:  # noqa: BLE001 (VMEM OOM at big tiles)
                print(f"T{T}: failed ({str(e)[:120]})", flush=True)

    if "base" in res:
        b = res["base"]
        for k, v in res.items():
            if k != "base":
                print(f"  {k}: delta vs base {b - v:+.4f} ms")

    # the committed irreducibility artifact (VERDICT r3 item 1): the
    # floor and dynfetch variants bound what any gather improvement can
    # recover for this merge-path structure on this matrix
    import json
    import os
    out = {"matrix": f"grid3d{n}", "rows": csr.num_rows,
           "nnz": csr.num_nonzeros, "plan": plan.describe(),
           "timing": "ingraph",
           "byte_model_gbps_at": {
               k: round((csr.num_nonzeros * 12 + csr.num_rows * 8)
                        / v / 1e6, 1) for k, v in res.items()},
           "variants_ms": {k: round(v, 4) for k, v in res.items()}}
    if "base" in res:
        out["deltas_vs_base_ms"] = {
            k: round(res["base"] - v, 4) for k, v in res.items()
            if k != "base"}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERF_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
