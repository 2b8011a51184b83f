#!/usr/bin/env python
"""Headline benchmark — emits ONE JSON line for the driver.

Metric: SpMV throughput (GFLOP/s = 2*nnz/time, the paper's headline unit,
Table 1 / Fig. 10) of the merge-path Pallas CsrMV on a 100^3 grid Laplacian
(1M rows, 5.94M nnz, fp32) on one TPU chip.  vs_baseline compares against
the reference's best single-device result: GPU merge CsrMV on circuit5M at
17.19 GFLOP/s fp64 (Tesla K40, README.md:138).  The effective bandwidth by
the reference byte model (cpu_spmv.cpp:508-509) is reported alongside.

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


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.utils.compare import compare_results

    csr = CsrMatrix.from_coo(CooMatrix.grid3d(100)).astype(np.float32)
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    n, nnz = csr.num_rows, csr.num_nonzeros

    op = build_operator(csr, dtype="float32")
    x = jnp.ones((csr.num_cols,), jnp.float32)

    # verify before timing (the reference's discipline, cpu_spmv.cpp:380-387)
    y = op(x)
    gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))
    assert compare_results(np.asarray(y), gold, verbose=False) is None, \
        "verification failed"

    @jax.jit
    def step(xc):
        return xc + op(xc) * 1e-20

    avg_ms = chained_kernel_ms(step, x)

    gflops = 2 * nnz / avg_ms / 1e6
    total_bytes = nnz * 12 + n * 8
    gbps = total_bytes / avg_ms / 1e6
    print(json.dumps({
        "metric": "grid3d100_merge_csrmv_fp32_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / 17.19, 4),
        "kernel_ms": round(avg_ms, 4),
        "effective_gbps": round(gbps, 3),
        "backend": op.plan.backend,
    }))
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
