#!/usr/bin/env python
"""Shape-faithful stand-ins for the five BASELINE.json configs.

No egress: the real SuiteSparse files (cant, webbase-1M, wb-edu,
pdb1HYS, kron_g500-logn21, cage15, nlpkkt240) cannot be downloaded, so
each config runs a synthetic stand-in matching the real matrix's ROWS,
NNZ, row-length distribution and column-locality class (the properties
the merge-path algorithm and the gather ladder are sensitive to).
Reference anchor: BASELINE.md table / paper Table 1;
`tools/get_suitesparse.py` ingests the real files when egress exists.

Writes/updates BASELINE_CONFIGS.json (one entry per config; resumable —
existing entries are kept unless --force).  Run on the TPU host:

    PYTHONPATH=.:$PYTHONPATH python tools/bench_baseline_configs.py [names...]

Configs: cant | webbase_pair | spmm | kron | cage15   (nlpkkt240's
multi-host config is covered by tools/bench_multichip.py / the dryrun).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BASELINE_CONFIGS.json")


def _wait_device(max_s=600):
    """Wait for the TPU worker to come back after a crash."""
    import jax
    import jax.numpy as jnp

    import numpy as np
    t0 = time.time()
    while time.time() - t0 < max_s:
        try:
            np.asarray(jnp.zeros((8,)) + 1.0)
            return True
        except Exception:  # noqa: BLE001
            time.sleep(20)
    return False


def kernel_ms(step, x0, n=10, reps=3):
    """In-graph chain first (immune to per-dispatch tunnel drift —
    NOTES.md round-4 measurement-trust entry); host-chained fallback
    when the in-graph difference never clears the jitter floor OR the
    chained graph crashes the worker (observed: the 57M-nnz XLA
    segment-sum inside a fori_loop kills the TPU worker while the same
    computation as separate dispatches runs fine)."""
    import math

    from merge_spmv_tpu.utils.timers import ingraph_rate_ms

    try:
        ms = ingraph_rate_ms(step, x0, steps=max(8, n))
        if not math.isnan(ms):
            return ms, "ingraph"
    except Exception as e:  # noqa: BLE001
        print(f"  ingraph timing failed ({str(e)[:90]}); "
              "host-chained fallback", flush=True)
        _wait_device()
    return chained_kernel_ms(step, x0, n=n, reps=reps), "host_chained"


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


def banded(n, deg, sigma, seed, dtype):
    """FEM-band stand-in: deg nnz/row, normal column offsets (bandwidth
    ~6 sigma) — the cant/pdb1HYS/cage15 locality class."""
    import numpy as np
    rs = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    off = rs.normal(0.0, sigma, rows.size).astype(np.int64)
    cols = np.clip(rows + off, 0, n - 1)
    vals = rs.uniform(-1.0, 1.0, rows.size).astype(dtype)
    return rows, cols, vals


def powerlaw_web(n, nnz, local_frac, spread, seed, dtype, alpha=1.2):
    """Web-graph stand-in: heavy-tail row degrees (pareto alpha) AND
    heavy-tail global-link targets — real web graphs have power-law
    IN-degree too (popular pages are hub columns), which is the property
    the hot/cold popularity split keys on.  Columns are a local/global
    mix (webbase class); the global share samples a Zipf-ranked random
    permutation of pages instead of the uniform draw an earlier version
    used (uniform global columns have no hubs and misrepresent the
    class)."""
    import numpy as np
    rs = np.random.RandomState(seed)
    raw = rs.pareto(alpha, n) + 1.0
    deg = np.maximum(1, (raw * (nnz / raw.sum())).astype(np.int64))
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    m = rows.size
    local = rs.random(m) < local_frac
    # Zipf-popular global targets: rank ~ floor(pareto), page identity
    # randomized so hubs land anywhere in the column space
    perm = rs.permutation(n).astype(np.int64)
    rank = np.minimum((rs.pareto(0.7, m) * 1.5).astype(np.int64), n - 1)
    cols = np.where(
        local,
        np.clip(rows + rs.randint(-spread, spread + 1, m), 0, n - 1),
        perm[rank])
    vals = rs.uniform(-1.0, 1.0, m).astype(dtype)
    return rows, cols, vals


def rmat(scale, nnz, seed, dtype, a=0.57, b=0.19, c=0.19):
    """Kronecker/R-MAT stand-in (kron_g500 class): power-law both ways,
    globally scattered columns — the gather ladder's adversary."""
    import numpy as np
    rs = np.random.RandomState(seed)
    rows = np.zeros(nnz, np.int64)
    cols = np.zeros(nnz, np.int64)
    for level in range(scale):
        r = rs.random(nnz)
        row_bit = r >= a + b                      # quadrants c, d
        col_bit = ((r >= a) & (r < a + b)) | (r >= a + b + c)   # b, d
        rows |= row_bit.astype(np.int64) << level
        cols |= col_bit.astype(np.int64) << level
    vals = rs.uniform(-1.0, 1.0, nnz).astype(dtype)
    return rows, cols, vals


def run_csrmv(name, csr, dtype_name, chains=10, out=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.device import peak_hbm_bandwidth
    from merge_spmv_tpu.utils.timers import operator_step_fn

    fp64 = dtype_name == "float64"
    if fp64:
        jax.config.update("jax_enable_x64", True)
    x = np.random.RandomState(1).uniform(0.5, 1.5, csr.num_cols
                                         ).astype(csr.values.dtype)
    t0 = time.time()
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    print(f"  gold ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    op = build_operator(csr, dtype=dtype_name)
    xd = jnp.asarray(x)
    y = op(xd)
    jax.block_until_ready(y)
    setup_s = time.time() - t0
    ok = compare_results(np.asarray(y), gold, verbose=True,
                         abs_bound=bound) is None
    print(f"  plan={op.plan.backend} x_win={op.plan.x_win} "
          f"K={op.plan.meta_k}@{op.plan.meta_gran} verify="
          f"{'PASS' if ok else 'FAIL'} (setup+compile {setup_s:.0f}s)",
          flush=True)
    step = operator_step_fn(op)
    ms, timing = kernel_ms(step, xd, n=chains)
    vb = 8 if fp64 else 4
    total_bytes = csr.num_nonzeros * (2 * vb + 4) + csr.num_rows * (4 + vb)
    gbps = total_bytes / ms / 1e6
    gflops = 2 * csr.num_nonzeros / ms / 1e6
    peak = peak_hbm_bandwidth()
    print(f"  {ms:.3f} ms  {gflops:.2f} GFLOP/s  {gbps:.1f} GB/s "
          f"({100*gbps/peak:.1f}% peak)", flush=True)
    rec = {"rows": csr.num_rows, "cols": csr.num_cols,
           "nnz": csr.num_nonzeros, "dtype": dtype_name,
           "avg_ms": round(ms, 3), "gflops": round(gflops, 3),
           "effective_gbps": round(gbps, 2),
           "pct_peak": round(100 * gbps / peak, 2),
           "verified": ok, "backend": op.plan.backend,
           "setup_compile_s": round(setup_s, 1), "timing": timing,
           "row_cov": round(float(csr.stats().row_length_variation), 2)}
    if fp64:
        jax.config.update("jax_enable_x64", False)
    return rec


def run_hotcold(csr, chains=6):
    """A/B the hot/cold popularity split (ops/split.py) against the
    default operator on a powerlaw-column matrix — fp32 only (the split
    targets the gather mechanics, not the precision path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.split import build_hotcold_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import hotcold_operator_step_fn

    t0 = time.time()
    op = build_hotcold_operator(csr, dtype="float32")
    print(f"  {op.describe()}", flush=True)
    if op.num_hot_windows == 0:
        return {"declined": True, "setup_ms": round(op.setup_ms, 0)}
    x = np.random.RandomState(1).uniform(0.5, 1.5, csr.num_cols
                                         ).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    xd = jnp.asarray(x)
    y = op(xd)
    jax.block_until_ready(y)
    setup_s = time.time() - t0
    ok = compare_results(np.asarray(y), gold, verbose=True,
                         abs_bound=bound) is None
    try:
        step = hotcold_operator_step_fn(op)
    except AssertionError:
        # mixed pallas/xla parts (e.g. the cold remainder of a >VMEM-x
        # matrix routes to XLA): time the operator __call__ directly
        import jax

        @jax.jit
        def step(xc):  # noqa: ANN001
            yc = op(xc)
            return xc + yc[:xc.shape[0]] * 1e-20
    ms, timing = kernel_ms(step, xd, n=chains)
    total_bytes = csr.num_nonzeros * 12 + csr.num_rows * 8
    gbps = total_bytes / ms / 1e6
    print(f"  hotcold: {ms:.3f} ms  {gbps:.1f} GB/s  "
          f"verify={'PASS' if ok else 'FAIL'} "
          f"(setup+compile {setup_s:.0f}s)", flush=True)
    return {"avg_ms": round(ms, 3),
            "gflops": round(2 * csr.num_nonzeros / ms / 1e6, 3),
            "effective_gbps": round(gbps, 2), "verified": ok,
            "hot_windows": op.num_hot_windows, "hot_nnz": op.hot_nnz,
            "cold_nnz": op.cold_nnz, "split_setup_ms": round(op.setup_ms, 0),
            "setup_compile_s": round(setup_s, 1), "timing": timing}


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()   # warm-page reuse for plan-time numpy
    import numpy as np

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix

    want = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "cant", "webbase_pair", "spmm", "cage15", "kron"]
    force = "--force" in sys.argv
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    if force:
        # drop only the REQUESTED configs' entries (a bare --force used
        # to start from {} and silently discard every other config's
        # measurement on save)
        prefixes = {"cant": ("cant_class",), "cage15": ("cage15_class",),
                    "webbase_pair": ("webbase", "wb_edu"),
                    "spmm": ("spmm_",), "kron": ("kron",)}
        for w in want:
            for k in list(results):
                if any(k.startswith(p) for p in prefixes.get(w, ())):
                    del results[k]

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1); f.write("\n")

    def build(gen_args, dtype):
        r_, c_, v_ = gen_args
        n = int(max(r_.max(), c_.max())) + 1
        return CsrMatrix.from_coo(CooMatrix(n, n, r_, c_, v_)).astype(dtype)

    if "cant" in want and "cant_class" not in results:
        # cant: 62,451 rows, 4,007,383 nnz, FEM band, fp64 (config 1)
        print("== cant_class (fp64 FEM band) ==", flush=True)
        csr = build(banded(62451, 64, 400.0, 11, np.float64), np.float64)
        results["cant_class"] = run_csrmv("cant_class", csr, "float64")
        save()

    # powerlaw_web generator version: bump when the generator changes so
    # a resumed run never mixes measurements across matrix versions (the
    # hotcold A/B and the pair ratio must compare the SAME matrices)
    WB_GEN = 2
    wb_keys = {"webbase_1M_class", "wb_edu_class", "wb_edu_class_hotcold"}
    for k in wb_keys:
        if results.get(k, {}).get("gen") != WB_GEN and k in results:
            print(f"(dropping stale {k}: generator version changed)",
                  flush=True)
            del results[k]
    if "webbase_pair" in want and not wb_keys <= results.keys():
        # webbase-1M: 1,000,005 rows, 3.1M nnz; wb-edu: 9,845,725 rows,
        # 57.2M nnz — the power-law skew pair (config 2)
        if "webbase_1M_class" not in results:
            print("== webbase_1M_class (fp32 powerlaw web) ==", flush=True)
            csr = build(powerlaw_web(1_000_005, 3_105_536, 0.85, 16384, 12,
                                     np.float32), np.float32)
            results["webbase_1M_class"] = run_csrmv("webbase_1M_class", csr,
                                                    "float32", chains=20)
            results["webbase_1M_class"]["gen"] = WB_GEN
            save()
        print("== wb_edu_class (fp32 powerlaw web, 57M nnz) ==", flush=True)
        csr = build(powerlaw_web(9_845_725, 57_156_537, 0.95, 32768, 13,
                                 np.float32), np.float32)
        if "wb_edu_class" not in results:
            try:
                results["wb_edu_class"] = run_csrmv("wb_edu_class", csr,
                                                    "float32", chains=6)
            except Exception as e:  # noqa: BLE001
                import traceback
                traceback.print_exc()
                results["wb_edu_class"] = {"error": str(e)[:200]}
                _wait_device()
            results["wb_edu_class"]["gen"] = WB_GEN
            save()
        if "wb_edu_class_hotcold" not in results:
            # hot/cold popularity split A/B on the same matrix (the
            # mechanism for powerlaw columns; VERDICT round-2 item 2)
            print("== wb_edu_class hot/cold split ==", flush=True)
            try:
                results["wb_edu_class_hotcold"] = run_hotcold(csr, chains=6)
            except Exception as e:  # noqa: BLE001
                import traceback
                traceback.print_exc()
                results["wb_edu_class_hotcold"] = {"error": str(e)[:200]}
            results["wb_edu_class_hotcold"]["gen"] = WB_GEN
        # the skew-invariance check across the pair (per-nnz rates)
        a = results["webbase_1M_class"]
        b = results["wb_edu_class"]
        if "avg_ms" in a and "avg_ms" in b:
            results["webbase_pair_per_nnz_ratio"] = round(
                (a["avg_ms"] / a["nnz"]) / (b["avg_ms"] / b["nnz"]), 3)
        save()

    if "spmm" in want and "spmm_cant_k32" not in results:
        # config 3: SpMM k=8/32 on cant + pdb1HYS classes, fp32
        import jax
        import jax.numpy as jnp

        from merge_spmv_tpu.ops.operator import build_operator
        from merge_spmv_tpu.utils.compare import compare_results
        for label, gen in (
                ("cant", banded(62451, 64, 400.0, 11, np.float32)),
                ("pdb1HYS", banded(36417, 119, 300.0, 14, np.float32))):
            csr = build(gen, np.float32)
            op = build_operator(csr, dtype="float32")
            for k in (8, 32):
                print(f"== spmm_{label}_k{k} ==", flush=True)
                rs = np.random.RandomState(2)
                X = rs.uniform(-1, 1, (csr.num_cols, k)).astype(np.float32)
                Xd = jnp.asarray(X)
                Y = op.mm(Xd)
                gold = csr.spmm_gold(X)
                err = float(np.max(np.abs(np.asarray(Y) - gold)))
                scale = float(np.max(np.abs(gold))) + 1e-9
                ok = err / scale < 1e-4

                def step(xc, op=op, k=k):
                    Yc = op.mm(jnp.broadcast_to(xc[:, None],
                                                (xc.shape[0], k)))
                    return xc + Yc[:xc.shape[0], 0] * 1e-20
                x0 = jnp.ones((csr.num_cols,), jnp.float32)
                ms, timing = kernel_ms(jax.jit(step), x0, n=6)
                gflops = 2 * csr.num_nonzeros * k / ms / 1e6
                print(f"  {ms:.3f} ms  {gflops:.1f} GFLOP/s  verified={ok}",
                      flush=True)
                results[f"spmm_{label}_k{k}"] = {
                    "rows": csr.num_rows, "nnz": csr.num_nonzeros, "k": k,
                    "avg_ms": round(ms, 3), "gflops": round(gflops, 2),
                    "verified": ok, "method": "column_loop",
                    "timing": timing}
                save()

    if "cage15" in want and "cage15_class" not in results:
        # cage15: 5,154,859 rows, 99,199,551 nnz, banded-ish, fp64
        print("== cage15_class (fp64, 99M nnz banded) ==", flush=True)
        csr = build(banded(5_154_859, 19, 10000.0, 15, np.float64),
                    np.float64)
        results["cage15_class"] = run_csrmv("cage15_class", csr, "float64",
                                            chains=4)
        save()

    if "kron" in want and "kron_g500_logn21_class" not in results:
        # kron_g500-logn21: 2,097,152 rows, 182,082,942 nnz, fp64 — the
        # plan-time-memory and gather-ladder stress test (config 4)
        print("== kron_g500_logn21_class (fp64 RMAT, 182M nnz) ==",
              flush=True)
        t0 = time.time()
        csr = build(rmat(21, 182_082_942, 16, np.float64), np.float64)
        print(f"  built in {time.time()-t0:.0f}s", flush=True)
        results["kron_g500_logn21_class"] = run_csrmv(
            "kron_g500_logn21_class", csr, "float64", chains=3)
        save()

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
