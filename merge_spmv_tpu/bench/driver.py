"""Benchmark driver — the TPU analog of the reference drivers
(cpu_spmv.cpp:537-747, gpu_spmv.cu:484-741).

Per run: ingest/generate → CSR + stats + histogram → gold SpMV →
for each backend: 1 verification pass (PASS/FAIL vs gold, length-scaled
ULP), warmup, timed iterations, perf line with GFLOP/s + effective GB/s +
% of chip peak.  `--quiet` switches to CSV fragments for corpus sweeps
(eval script analog).

Backends (the baseline roster mirrors MKL/cuSPARSE in the reference):
  merge   — the Pallas merge-path kernel (this framework's product)
  xla     — XLA segment-sum formulation (device library baseline)
  scipy   — SciPy csr_matrix @ x on host CPU (MKL-analog baseline)
  torch   — torch.sparse.csr on host CPU (second vendor baseline)
"""

from __future__ import annotations

import sys

import numpy as np

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.utils.compare import compare_results
from merge_spmv_tpu.utils.timers import (Timer, adaptive_timing_iterations,
                                         ingraph_rate_ms)
from merge_spmv_tpu.utils.device import device_info, peak_hbm_bandwidth

__all__ = ["build_matrix", "run_benchmark", "display_perf", "BackendResult"]


class BackendResult:
    def __init__(self, name, avg_ms, setup_ms, verified, error_index=None):
        self.name = name
        self.avg_ms = avg_ms
        self.setup_ms = setup_ms
        self.verified = verified
        self.error_index = error_index


def build_matrix(args) -> CsrMatrix:
    """Matrix selection mirroring RunTests (cpu_spmv.cpp:550-593)."""
    if args.get("mtx"):
        coo = CooMatrix.from_market(args["mtx"], default_value=1.0)
        if coo.num_rows == 1 or coo.num_cols == 1 or coo.num_nonzeros == 1:
            if not args.get("quiet"):
                print("Trivial dataset")
            sys.exit(0)
        import os
        label = os.path.splitext(os.path.basename(args["mtx"]))[0]
    elif args.get("grid2d"):
        coo = CooMatrix.grid2d(args["grid2d"], self_loop=False)
        label = f"grid2d_{args['grid2d']}"
    elif args.get("grid3d"):
        coo = CooMatrix.grid3d(args["grid3d"], self_loop=False)
        label = f"grid3d_{args['grid3d']}"
    elif args.get("wheel"):
        coo = CooMatrix.wheel(args["wheel"])
        label = f"wheel_{args['wheel']}"
    elif args.get("dense"):
        cols = args["dense"]
        rows = (1 << 24) // cols          # 16M nnz (cpu_spmv.cpp:584)
        coo = CooMatrix.dense(rows, cols)
        label = f"dense_{rows}_x_{cols}"
    elif args.get("powerlaw"):
        n = args["powerlaw"]
        coo = CooMatrix.random_powerlaw(n, n, 16 * n, seed=args.get("seed", 0))
        label = f"powerlaw_{n}"
    elif args.get("uniform"):
        n = args["uniform"]
        coo = CooMatrix.random_uniform(n, n, 16, seed=args.get("seed", 0))
        label = f"uniform_{n}"
    else:
        print("No graph type specified (--mtx/--grid2d/--grid3d/--wheel/"
              "--dense/--powerlaw/--uniform).", file=sys.stderr)
        sys.exit(1)
    print(f"{label}, ", end="", flush=True)
    return CsrMatrix.from_coo(coo)


def display_perf(name, setup_ms, avg_ms, csr, value_bytes, quiet=False,
                 peak_gbps=None, num_rhs=1):
    """Perf line (cpu_spmv.cpp:502-528 byte/flop model, RHS-scaled).

    A NaN ``avg_ms`` means the timer could not resolve the kernel above
    transport jitter even at its longest chain (utils/timers.py); such rows
    are reported as below-resolution, never as derived rates (round-2's
    corpus artifact printed physically impossible TFLOP/s rows by deriving
    rates from floored differences)."""
    if avg_ms != avg_ms:  # NaN
        if quiet:
            print(f"{setup_ms:.5f}, below_resolution, , , ",
                  end="", flush=True)
        else:
            print(f"fp{value_bytes * 8}: {setup_ms:.4f} setup ms, "
                  "below timer resolution (kernel faster than transport "
                  "jitter)", flush=True)
        return {"gflops": None, "gbps": None, "avg_ms": None,
                "below_resolution": True}
    total_bytes = (csr.num_nonzeros * (value_bytes * (1 + num_rhs) + 4)
                   + csr.num_rows * (4 + value_bytes * num_rhs))
    gflops = 2 * num_rhs * csr.num_nonzeros / avg_ms / 1e6
    gbps = total_bytes / avg_ms / 1e6
    if quiet:
        print(f"{setup_ms:.5f}, {avg_ms:.5f}, {gflops:.6f}, {gbps:.3f}, ",
              end="", flush=True)
    else:
        pct = f", {100.0 * gbps / peak_gbps:.2f}% peak" if peak_gbps else ""
        print(f"fp{value_bytes * 8}: {setup_ms:.4f} setup ms, "
              f"{avg_ms:.4f} avg ms, {gflops:.5f} gflops, "
              f"{gbps:.3f} effective GB/s{pct}", flush=True)
    return {"gflops": gflops, "gbps": gbps, "avg_ms": avg_ms}


def _verify(name, y, gold, quiet, abs_bound=None):
    idx = compare_results(np.asarray(y), gold, verbose=not quiet,
                          abs_bound=abs_bound)
    if not quiet:
        print(f"\t{'FAIL' if idx is not None else 'PASS'}", flush=True)
    return idx


def _generic_step(op, csr, jax, jnp):
    """Jitted chained-timing step over an operator __call__ (used when a
    backend has no prepared arrays-as-arguments fast path)."""
    def step(xc, _op=op):
        y = _op(xc).astype(xc.dtype)
        if csr.num_rows >= csr.num_cols:
            return xc + y[:csr.num_cols] * 1e-20
        return xc + jnp.pad(y, (0, csr.num_cols - csr.num_rows)) * 1e-20
    return jax.jit(step)


def _bench_device_backend(backend, csr, x, gold, args, abs_bound=None):
    """Verify + time a device backend (operator dispatch path)."""
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator

    quiet = args.get("quiet", False)
    xd = jnp.asarray(x)

    alpha = args.get("alpha", 1.0)
    beta = args.get("beta", 0.0)
    y_in = jnp.ones(csr.num_rows, csr.values.dtype) if beta else None

    # setup is the analog of the reference's "setup" column (HYB conversion,
    # gpu_spmv.cu:129), split into its two very different components:
    #   prep    — plan + gather-plan construction + H2D upload (per matrix)
    #   compile — first-call XLA/Mosaic compile (per SHAPE CLASS: cached
    #             across matrices of the same plan key, and ~10x inflated
    #             here by the remote compile service round trip)
    # "merge" resolves through backend="auto" so fp64 routes to the
    # double-single pallas_ds kernel (make_plan policy) instead of
    # silently timing the fp32 kernel.
    prep_t = Timer().start()
    if backend == "split":
        from merge_spmv_tpu.ops.split import build_split_operator
        nb = args.get("split")
        op = build_split_operator(
            csr, dtype=csr.values.dtype,
            edges_chunks="quantile" if isinstance(nb, int) and nb > 1
            else (8, 32),
            num_bands=nb if isinstance(nb, int) and nb > 1 else 5,
            tile_items=args.get("tile_items"))
    elif backend == "hotcold":
        from merge_spmv_tpu.ops.split import build_hotcold_operator
        op = build_hotcold_operator(csr, dtype=csr.values.dtype,
                                    tile_items=args.get("tile_items"))
        if not quiet:
            print(f"({op.describe()}) ", end="", flush=True)
    elif backend == "dia":
        from merge_spmv_tpu.ops.dia import build_dia_operator
        op = build_dia_operator(csr, dtype=csr.values.dtype,
                                tile_items=args.get("tile_items"))
        if not quiet:
            print(f"({op.describe()}) ", end="", flush=True)
    else:
        op = build_operator(csr, dtype=csr.values.dtype,
                            backend="auto" if backend == "merge" else "xla",
                            tile_items=args.get("tile_items"),
                            autotune=bool(args.get("autotune")),
                            gather_group=args.get("gather_group", 1),
                            gather_cluster=bool(
                                args.get("gather_cluster", False)))
    prep_t.stop()
    if backend == "merge" and op.plan.backend == "xla" and not quiet:
        print("(plan fell back to xla) ", end="", flush=True)
    compile_t = Timer().start()
    step0 = None
    if (backend == "merge" and beta == 0.0 and alpha == 1.0
            and y_in is None
            and getattr(op, "_prep", None) is not None
            and op.plan.backend == "pallas"):
        # share ONE compiled module between the verify call and every
        # timing chain (timers.operator_step_fn .chain): per-row remote
        # compiles were the corpus sweep's dominant cost (round 5)
        from merge_spmv_tpu.utils.timers import operator_step_fn
        cand = operator_step_fn(op)
        ch = getattr(cand, "chain", None)
        if ch is not None:
            out = ch(xd, jnp.int32(1), *cand.args)
            y = out[1][:csr.num_rows].astype(csr.values.dtype)
            jax.block_until_ready(y)
            step0 = cand
    if step0 is None:
        y = op(xd, y_in=y_in, alpha=alpha, beta=beta)
        jax.block_until_ready(y)
    compile_t.stop()
    if not quiet:
        br = getattr(op, "setup_s", None)
        br_s = ("" if not br else
                " (plan {plan:.2f}s meta {meta:.2f}s prep+upload "
                "{prepare:.2f}s)".format(**br))
        print(f"[prep {prep_t.elapsed_millis():.0f} ms{br_s}, first-call "
              f"{compile_t.elapsed_millis():.0f} ms] ", end="", flush=True)
    setup_ms = prep_t.elapsed_millis() + compile_t.elapsed_millis()

    idx = _verify(backend, y, gold, quiet, abs_bound)

    iters = args.get("i") or adaptive_timing_iterations(
        csr.num_nonzeros, max_iterations=args.get("max_iters", 2000))
    chain_steps = max(16, min(iters, 256))

    if beta == 0.0 and alpha == 1.0:
        # arrays-as-arguments step: a jit closure would embed the matrix
        # in the remote-compile payload (HTTP 413 at circuit5M scale)
        if backend == "split":
            if getattr(op.op, "_prep", None) is not None:
                from merge_spmv_tpu.utils.timers import (
                    split_operator_step_fn)
                step = split_operator_step_fn(op)
            else:
                # stacked plan fell back to XLA (off-TPU): generic step
                step = _generic_step(op, csr, jax, jnp)
        elif backend == "dia":
            if (op.rest_op is None
                    or (getattr(op.rest_op, "_prep", None) is not None
                        and op.rest_op.plan.backend == "pallas")):
                from merge_spmv_tpu.utils.timers import dia_operator_step_fn
                step = dia_operator_step_fn(op)
            else:
                # leftover part fell off the pallas fast path
                step = _generic_step(op, csr, jax, jnp)
        elif backend == "hotcold":
            parts = [o for o in (op.hot_op, op.cold_op) if o is not None]
            if all(getattr(o, "_prep", None) is not None
                   and o.plan.backend == "pallas" for o in parts):
                from merge_spmv_tpu.utils.timers import (
                    hotcold_operator_step_fn)
                step = hotcold_operator_step_fn(op)
            else:
                # a part fell off the pallas fast path: generic step
                step = _generic_step(op, csr, jax, jnp)
        else:
            from merge_spmv_tpu.utils.timers import operator_step_fn
            step = step0 if step0 is not None else operator_step_fn(op)
    else:
        def step(xc):
            # every element of xc depends on yc so no step can be elided
            yc = op(xc, y_in=y_in, alpha=alpha, beta=beta)
            yc = yc.astype(xc.dtype)
            if csr.num_rows >= csr.num_cols:
                return xc + yc[:csr.num_cols] * 1e-20
            return xc + jnp.pad(yc, (0, csr.num_cols - csr.num_rows)
                                ) * 1e-20

        step = jax.jit(step)
    # in-graph chain: one dispatch runs the whole chain, so per-dispatch
    # tunnel jitter (+-8 ms observed) cannot pollute the rate the way the
    # host-chained form's did (round-4 measured 2x drift on one kernel)
    avg_ms = ingraph_rate_ms(step, xd, steps=chain_steps,
                             jitter_floor_ms=25.0, max_steps=16384)
    return BackendResult(backend, avg_ms, setup_ms, idx is None, idx)


def _bench_scipy(csr, x, gold, args, abs_bound=None):
    try:
        import scipy.sparse as sp
    except ImportError:
        return None
    quiet = args.get("quiet", False)
    t = Timer().start()
    m = sp.csr_matrix((csr.values, csr.col_indices, csr.row_offsets),
                      shape=(csr.num_rows, csr.num_cols))
    t.stop()
    alpha, beta = args.get("alpha", 1.0), args.get("beta", 0.0)
    y_in = np.ones(csr.num_rows, csr.values.dtype) if beta else None

    def spmv():
        # full epilogue timed (the device backends time it too — anything
        # less inflates the quoted speedups whenever alpha/beta are set)
        y = m @ x
        if alpha != 1.0:
            y = alpha * y
        if beta:
            y = y + beta * y_in
        return y

    y = spmv()
    idx = _verify("scipy", y, gold, quiet, abs_bound)
    iters = min(args.get("i") or adaptive_timing_iterations(
        csr.num_nonzeros, max_iterations=200), 200)
    tm = Timer().start()
    for _ in range(iters):
        y = spmv()
    tm.stop()
    return BackendResult("scipy", tm.elapsed_millis() / iters,
                         t.elapsed_millis(), idx is None, idx)


def _bench_torch(csr, x, gold, args, abs_bound=None):
    try:
        import torch
    except ImportError:
        return None
    quiet = args.get("quiet", False)
    t = Timer().start()
    m = torch.sparse_csr_tensor(
        torch.from_numpy(np.ascontiguousarray(csr.row_offsets, dtype=np.int64)),
        torch.from_numpy(np.ascontiguousarray(csr.col_indices, dtype=np.int64)),
        torch.from_numpy(np.ascontiguousarray(csr.values)),
        size=(csr.num_rows, csr.num_cols))
    xt = torch.from_numpy(np.ascontiguousarray(x))
    t.stop()
    alpha, beta = args.get("alpha", 1.0), args.get("beta", 0.0)
    y_in_t = (torch.ones(csr.num_rows, dtype=xt.dtype) if beta else None)

    def spmv():
        # full epilogue timed, matching the device backends
        y = m @ xt
        if alpha != 1.0:
            y = alpha * y
        if beta:
            y = y + beta * y_in_t
        return y

    y = spmv().numpy()
    idx = _verify("torch", y, gold, quiet, abs_bound)
    iters = min(args.get("i") or adaptive_timing_iterations(
        csr.num_nonzeros, max_iterations=200), 200)
    tm = Timer().start()
    for _ in range(iters):
        y = spmv()
    tm.stop()
    return BackendResult("torch", tm.elapsed_millis() / iters,
                         t.elapsed_millis(), idx is None, idx)


def run_benchmark(args) -> dict:
    """Full benchmark flow; returns {backend: perf dict}."""
    quiet = args.get("quiet", False)
    fp64 = not args.get("fp32", True)
    dtype = np.float64 if fp64 else np.float32
    vb = 8 if fp64 else 4
    if fp64:
        # without x64, device uploads silently truncate to fp32 and the
        # double-single split degenerates (v_lo == 0)
        import jax
        jax.config.update("jax_enable_x64", True)

    csr = build_matrix(args).astype(dtype)
    stats = csr.stats()
    stats.display(show_labels=not quiet,
                  out=(lambda s: print(s, end="" if quiet else "\n", flush=True)))
    if not quiet:
        print()
        csr.display_histogram()
        print()
        if args.get("v2"):
            csr.display()
        info = device_info()
        print(f"device: {info['platform']} {info['device_kind']} "
              f"(peak {info['peak_hbm_gbps']} GB/s)\n")

    # vectors (ones, matching RunTests cpu_spmv.cpp:637-641); --beta
    # exercises the full y = alpha*A*x + beta*y_in epilogue
    x = np.ones(csr.num_cols, dtype=dtype)
    beta = args.get("beta", 0.0)
    y_in = np.ones(csr.num_rows, dtype=dtype) if beta else None
    gold = csr.spmv_gold(x, y_in, alpha=args.get("alpha", 1.0), beta=beta)
    abs_bound = csr.spmv_abs_bound(x, y_in, alpha=args.get("alpha", 1.0),
                                   beta=beta)

    peak = peak_hbm_bandwidth()
    results = {}
    backends = args.get("backends") or ["scipy", "xla", "merge"]

    for backend in backends:
        if not quiet:
            print(f"\n{_display_name(backend)}, ", end="", flush=True)
        else:
            print(f"{_display_name(backend)}, ", end="", flush=True)
        if backend in ("merge", "xla", "split", "hotcold", "dia"):
            r = _bench_device_backend(backend, csr, x, gold, args, abs_bound)
        elif backend == "scipy":
            r = _bench_scipy(csr, x, gold, args, abs_bound)
        elif backend == "torch":
            r = _bench_torch(csr, x, gold, args, abs_bound)
        else:
            print(f"unknown backend {backend}", file=sys.stderr)
            continue
        if r is None:
            continue
        results[backend] = display_perf(
            backend, r.setup_ms, r.avg_ms, csr, vb, quiet=quiet,
            peak_gbps=peak if backend in ("merge", "xla", "split",
                                          "hotcold", "dia") else None)
        results[backend]["verified"] = r.verified
    print()
    return results


def _display_name(backend):
    return {"merge": "Merge CsrMV (pallas)", "xla": "XLA CsrMV",
            "scipy": "SciPy CsrMV", "torch": "Torch CsrMV",
            "split": "Banded-split CsrMV (stacked)",
            "hotcold": "Hot/cold-split CsrMV",
            "dia": "DIA-split CsrMV"}.get(backend, backend)
