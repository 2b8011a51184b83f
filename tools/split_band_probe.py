"""Locate the stacked-split error by (band, row) on chip (round 4).

split_ab found the full-scale errors concentrate in the last ~23K rows
(clipped-column hub rows) with OVERcounting, identical for
runtime_skip=True/False.  This probe keeps the stacked y_v and compares
per-band partials against host per-band gold on the worst rows.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from merge_spmv_tpu.utils.hostmem import enable_warm_heap  # noqa: E402

enable_warm_heap()


def main():
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.operator import build_operator
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.ops.split import (_row_ids, band_assignment,
                                          stack_bands)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    d = np.load("/tmp/circuit_cache.npz")
    csr = CsrMatrix(int(d["n"]), int(d["n"]), d["ro"], d["ci"], d["v"])
    if csr.values.dtype != np.float32:
        csr = csr.astype(np.float32)
    m = csr.num_rows
    row_ids = _row_ids(csr)
    band, nb = band_assignment(csr, "quantile", num_bands=B,
                               row_ids=row_ids)
    tile_items = make_plan(nb * m, csr.num_cols, csr.num_nonzeros,
                           dtype="float32").tile_items
    stacked, m_pad = stack_bands(csr, band, nb, row_ids=row_ids,
                                 tile_items=tile_items)
    x = np.random.RandomState(1).uniform(0.1, 1.0,
                                         csr.num_cols).astype(np.float32)
    t0 = time.time()
    op = build_operator(stacked, dtype="float32", tile_items=tile_items)
    y_v = np.asarray(op(jnp.asarray(x)))[:nb * m_pad].reshape(nb, m_pad)
    print(f"kernel ran ({time.time()-t0:.0f}s) plan x_win={op.plan.x_win} "
          f"r_win={op.plan.r_win} rs={op.plan.runtime_skip}", flush=True)

    # host per-band gold (fp64) — stacked host gold
    yg_v = stacked.spmv_gold(x).reshape(nb, m_pad)
    err = np.abs(y_v - yg_v)
    rel = err / np.maximum(np.abs(yg_v), 1e-30)
    bad_mask = (err > 1e-3) & (rel > 1e-3)
    print("bad (band,rows) counts:", {b: int(bad_mask[b].sum())
                                      for b in range(nb)
                                      if bad_mask[b].sum()}, flush=True)
    for b in range(nb):
        n_b = int(bad_mask[b].sum())
        if not n_b:
            continue
        rows_b = np.flatnonzero(bad_mask[b])
        # where do the bad rows' nnz live in the stacked item space?
        ro = stacked.row_offsets
        r0, r1 = rows_b.min(), rows_b.max()
        worst = rows_b[np.argsort(-err[b][rows_b])[:3]]
        print(f" band {b}: {n_b} bad rows in [{r0}, {r1}] of {m_pad}; "
              f"worst {worst.tolist()} err {err[b][worst]}")
        for r in worst[:2]:
            s0, s1 = int(ro[b * m_pad + r]), int(ro[b * m_pad + r + 1])
            tile0, tile1 = ((b * m_pad + r + s0) // tile_items,
                            (b * m_pad + r + s1) // tile_items)
            blk0, blk1 = s0 // 1024, s1 // 1024
            print(f"   row {r}: nnz [{s0},{s1}) len {s1-s0} "
                  f"merge-tiles [{tile0},{tile1}] nnz-blocks "
                  f"[{blk0},{blk1}] got {y_v[b][r]:.4f} "
                  f"want {yg_v[b][r]:.4f}", flush=True)


if __name__ == "__main__":
    main()
