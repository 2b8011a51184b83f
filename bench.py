#!/usr/bin/env python
"""Headline benchmark — emits ONE JSON line for the driver.

Metric: effective bandwidth (reference byte model, cpu_spmv.cpp:508-509) of
the merge-path Pallas CsrMV on a 100^3 grid Laplacian (banded, 1M rows,
5.94M nnz, fp32) on one TPU chip.  vs_baseline compares against the
reference's best single-device result: GPU merge CsrMV at 181.6 GB/s
effective on circuit5M fp64 (Tesla K40, README.md:138).
"""

import json
import sys


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.csrmv import csrmv
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.utils.compare import compare_results
    from merge_spmv_tpu.utils.timers import chained_rate_ms

    csr = CsrMatrix.from_coo(CooMatrix.grid3d(100)).astype(np.float32)
    rs = np.random.RandomState(0)
    csr.values = rs.uniform(0.5, 1.5, csr.num_nonzeros).astype(np.float32)
    n, nnz = csr.num_rows, csr.num_nonzeros

    plan = make_plan(n, csr.num_cols, nnz, dtype=np.float32, backend="auto")
    v, re_, ci = csr.to_device(dtype=np.float32)
    x = jnp.ones((csr.num_cols,), jnp.float32)

    # verify before timing (the reference's discipline)
    y = csrmv(plan, v, re_, ci, x)
    gold = csr.spmv_gold(np.ones(csr.num_cols, np.float32))
    assert compare_results(np.asarray(y), gold, verbose=False) is None, \
        "verification failed"

    def step(xc):
        yc = csrmv(plan, v, re_, ci, xc)
        return xc * (1.0 + jnp.tanh(jnp.sum(yc)) * 1e-12)

    step = jax.jit(step)
    avg_ms = chained_rate_ms(step, x, n1=5, n2=20, reps=3)

    total_bytes = nnz * 12 + n * 8
    gbps = total_bytes / avg_ms / 1e6
    print(json.dumps({
        "metric": "grid3d100_merge_csrmv_fp32_effective_bandwidth",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 181.6, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
