"""Debug the stacked-split verify failure at circuit5M scale (round 4).

band_sweep measured split B=16/B=29 verify=FAIL with single-element
errors (e.g. stacked row 5,482,336: 0.673 vs gold 1.077) while the
default merge path PASSES on the same matrix.  This probe runs entirely
on HOST (no TPU): it rebuilds the stacked matrix and checks the
INVARIANTS the kernel relies on, in particular that every tile's column
span fits inside its planned streaming x window (the kernel's
`clip(sub - cbase, 0, x_win - count)` silently reads wrong x rows
otherwise).

    python tools/split_debug.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from merge_spmv_tpu.utils.hostmem import enable_warm_heap  # noqa: E402

enable_warm_heap()


def main():
    import os

    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np
    from merge_spmv_tpu.ops.plan import make_plan
    from merge_spmv_tpu.ops.split import (_row_ids, band_assignment,
                                          stack_bands)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cache = "/tmp/circuit_cache.npz"
    assert os.path.exists(cache), "run band_sweep first to build the cache"
    d = np.load(cache)
    csr = CsrMatrix(int(d["n"]), int(d["n"]), d["ro"], d["ci"], d["v"])
    if csr.values.dtype != np.float32:
        csr = csr.astype(np.float32)
    t0 = time.time()
    row_ids = _row_ids(csr)
    band, nb = band_assignment(csr, "quantile", num_bands=B,
                               row_ids=row_ids)
    tile_items = make_plan(nb * csr.num_rows, csr.num_cols,
                           csr.num_nonzeros, dtype="float32").tile_items
    stacked, m_pad = stack_bands(csr, band, nb, row_ids=row_ids,
                                 tile_items=tile_items)
    print(f"stacked: {stacked.num_rows} rows, {stacked.num_nonzeros} nnz, "
          f"B={nb}, m_pad={m_pad}, tile_items={tile_items} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # invariant 0: stacked gold == plain gold (host, fp64 accumulate)
    x = np.random.RandomState(1).uniform(0.1, 1.0,
                                         csr.num_cols).astype(np.float32)
    yg = csr.spmv_gold(x)
    ygs_v = stacked.spmv_gold(x)
    ygs = ygs_v.reshape(nb, m_pad)[:, :csr.num_rows].sum(axis=0)
    bad = np.flatnonzero(~np.isclose(ygs, yg, rtol=1e-4, atol=1e-5))
    print(f"host stacked-vs-plain gold mismatches: {bad.size}"
          + (f" first {bad[:5]} {ygs[bad[:5]]} vs {yg[bad[:5]]}"
             if bad.size else ""), flush=True)

    # invariant 1: band alignment — every band starts on a tile boundary
    per_band = stacked.num_rows // nb * 0 + m_pad
    ro = stacked.row_offsets
    for b in range(nb):
        nnz_start = int(ro[b * m_pad])
        items_start = b * m_pad + nnz_start
        if items_start % tile_items or nnz_start % 1024:
            print(f"ALIGN FAIL band {b}: items_start={items_start} "
                  f"nnz_start={nnz_start}")
    print("alignment checked", flush=True)

    # invariant 2: per-tile column span fits the planned x window
    plan = make_plan(stacked.num_rows, stacked.num_cols,
                     stacked.num_nonzeros, dtype="float32",
                     row_end_offsets=stacked.row_offsets[1:],
                     col_indices=stacked.col_indices,
                     tile_items=tile_items)
    print("plan:", plan.describe(), "x_win", plan.x_win,
          "x_in_vmem", plan.x_in_vmem, flush=True)
    if plan.x_win:
        from merge_spmv_tpu.ops.gather_plan import tile_col_meta_np
        cbase, x_win_sub = tile_col_meta_np(
            stacked.col_indices, stacked.num_nonzeros,
            stacked.row_offsets[1:], plan.tile_items)
        _, tile_nnz = merge_tile_coordinates_np(
            stacked.row_offsets[1:], stacked.num_nonzeros, plan.tile_items)
        num_sub = 8 * max(1, -(-stacked.num_cols // 1024))
        nbad = 0
        for t in range(len(tile_nnz) - 1):
            lo, hi = int(tile_nnz[t]), int(tile_nnz[t + 1])
            if hi <= lo:
                continue
            cols_t = stacked.col_indices[lo:hi]
            smin = int(cols_t.min()) >> 7
            smax = int(cols_t.max()) >> 7
            cb = int(cbase[t])
            # kernel fetch: rel = clip(s - cb, 0, x_win - count); count<=8
            if smin < cb or smax >= cb + plan.x_win:
                if nbad < 10:
                    print(f"XWIN FAIL tile {t}: cols sub [{smin},{smax}] "
                          f"outside [cb={cb}, cb+x_win={cb + plan.x_win})")
                nbad += 1
        print(f"x-window coverage: {nbad} bad tiles "
              f"of {len(tile_nnz)-1}", flush=True)


if __name__ == "__main__":
    main()
