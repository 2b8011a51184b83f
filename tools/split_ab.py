"""On-chip A/B for the stacked-split verify failure (round 4).

Host invariants (tools/split_debug.py) all pass, so the defect is in the
kernel for the stacked SHAPE: 61% of merge items are rows (most stacked
rows are empty), which flips the plan to runtime_skip=True — a
combination (skip + x-window streaming + range walk) never verified
compiled at this scale.  This probe builds the stacked matrix once and
verifies the kernel under explicit knob settings, full scale and
quarter scale, verify-only (no timing).

    python tools/split_ab.py [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from merge_spmv_tpu.utils.hostmem import enable_warm_heap  # noqa: E402

enable_warm_heap()


def check(stacked, nb, m_pad, m, yg, x, tile_items, rs_knob):
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator

    t0 = time.time()
    try:
        op = build_operator(stacked, dtype="float32", tile_items=tile_items,
                            runtime_skip=rs_knob)
        y_v = op(jnp.asarray(x))
        jax.block_until_ready(y_v)
        y = np.asarray(y_v)[:nb * m_pad].reshape(nb, m_pad)[:, :m].sum(0)
        err = np.abs(y - yg)
        rel = err / np.maximum(np.abs(yg), 1e-30)
        bad = np.flatnonzero((err > 1e-3) & (rel > 1e-3))
        worst = np.argsort(-err)[:5]
        print(f"rs={rs_knob}: plan rs={op.plan.runtime_skip} "
              f"x_win={op.plan.x_win} r_win={op.plan.r_win} "
              f"bad={bad.size} max_err={err.max():.5f} "
              f"worst={worst.tolist()} got={y[worst]} want={yg[worst]} "
              f"rel>10%={int((rel > 0.1).sum())} "
              f"rel>1%={int((rel > 0.01).sum())} "
              f"({time.time()-t0:.0f}s)", flush=True)
        if bad.size:
            np.save(f"/tmp/split_err_rs{rs_knob}.npy", err)
        return bad
    except Exception as e:  # noqa: BLE001
        print(f"rs={rs_knob}: FAILED {str(e)[:200]}", flush=True)
        return None


def main():
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.ops.split import (_row_ids, band_assignment,
                                          stack_bands)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cache = "/tmp/circuit_cache.npz"
    assert os.path.exists(cache)
    d = np.load(cache)
    csr = CsrMatrix(int(d["n"]), int(d["n"]), d["ro"], d["ci"], d["v"])
    if csr.values.dtype != np.float32:
        csr = csr.astype(np.float32)

    for scale_name, csr_s in (("quarter", None), ("full", csr)):
        if csr_s is None:
            # quarter: first quarter of the rows, columns clipped
            m_q = csr.num_rows // 4
            ro = csr.row_offsets[:m_q + 1]
            nnz_q = int(ro[-1])
            csr_s = CsrMatrix(m_q, m_q, ro,
                              np.clip(csr.col_indices[:nnz_q], 0, m_q - 1),
                              csr.values[:nnz_q])
        m = csr_s.num_rows
        row_ids = _row_ids(csr_s)
        band, nb = band_assignment(csr_s, "quantile", num_bands=B,
                                   row_ids=row_ids)
        tile_items = make_plan(nb * m, csr_s.num_cols,
                               csr_s.num_nonzeros, dtype="float32"
                               ).tile_items
        stacked, m_pad = stack_bands(csr_s, band, nb, row_ids=row_ids,
                                     tile_items=tile_items)
        x = np.random.RandomState(1).uniform(
            0.1, 1.0, csr_s.num_cols).astype(np.float32)
        yg = csr_s.spmv_gold(x)
        print(f"== {scale_name}: {m} rows, {csr_s.num_nonzeros} nnz, "
              f"B={nb}, stacked {stacked.num_rows} rows, "
              f"tile={tile_items}", flush=True)
        for rs_knob in (False, True):
            check(stacked, nb, m_pad, m, yg, x, tile_items, rs_knob)


if __name__ == "__main__":
    main()
