"""Merge-path SpMM (CsrMM): Y = alpha*A*X + beta*Y_in as one Pallas kernel.

TPU-native multi-RHS design (SURVEY.md §7.2 item 6).  The per-column
csrmv loop pays the full CSR traffic and gather work once per RHS column;
this kernel amortizes both by laying the RHS dimension across **sublanes**
and the item/row dimension across **lanes**:

* X enters as a 3D window table ``XT3 [NW, k_pad, 128]`` (NW 128-column
  windows, k_pad = 8*ceil(k/8), k ≤ 128); one 8-RHS *slab* is an
  (8, 128)-register row of a window.
* For a 128-item register, ONE ``take_along_axis`` lane-gather against a
  slab's 128-column x window produces the gathered x for all 8 RHS at
  once — each csrmv-style gather visit now serves 8 outputs.  The
  gather-plan metadata (ops/gather_plan.py) is reused unchanged (window
  ids are still ``col >> 7``).
* Products ``PT[kk, j] = v[j] * XT[kk, col[j]]`` get a per-register
  inclusive lane cumsum + an exclusive register-prefix table (the
  csrmv two-level segmented reduction, transposed); per-row sums are
  first differences at row-end positions, per slab.
* Row-spanning tiles are repaired by a per-slab carry column in scratch
  (sequential-grid replacement of the reference fixup kernel,
  agent_segment_fixup.cuh:226-341) — carries are k-vectors here.
* Y leaves transposed as ``YT [k_pad, num_rows]`` via a rolling
  accumulated window per slab with serialized async write DMAs, exactly
  like csrmv's rolling y.

Every dynamically-indexed table is laid out with the dynamic axis MAJOR
(first) — ``XT3[w]``, ``cs3[c]``, staged write slots — never as a dynamic
lane-dimension slice.  The first hardware version indexed x windows and
the cumsum table with dynamic *lane* offsets (``xt[:, w*128:...]``);
Mosaic lowers each such slice through an expensive roll/select chain, and
the ~1.5K of them per tile were ~5x the kernel's entire useful vector
work (the round-2 "wide kernel loses to its own fallback" defect).  With
the major-dim layout a window/chunk fetch is the same cheap form as
csrmv's ``cs_s[c]``, and one fetch serves all RHS slabs.

Why not an MXU one-hot formulation: gathering via ``onehot @ x_window``
must generate the (items, window) one-hot per visit — ~128 vector ops per
1024 gathered elements, more than this kernel's entire gather+products
budget.  The VPU lane-gather with sublane-RHS amortization is strictly
cheaper for k ≤ 128.

X beyond VMEM reuses the per-tile column-window streaming metadata
(cbase, in 128-column window units): the per-tile DMA is a MAJOR-dim
range slice ``XT3[cb : cb + x_win]`` into a double-buffered scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merge_spmv_tpu.ops.csrmv_pallas import (PreparedCsrmv, _prepare_traced,
                                             pad_csr_arrays)
from merge_spmv_tpu.ops.gather_plan import BLOCK, meta_width
from merge_spmv_tpu.ops.plan import SpmvPlan

__all__ = ["csrmm_wide", "prepare_csrmm", "csrmm_wide_prepared",
           "make_mm_plan"]

LANES = 128
SUBLANES = 8


def _spmm_kernel(
    # scalar prefetch
    tile_rows_ref, tile_nnz_ref, cbase_ref,
    # inputs
    xt_ref,           # (NW, k_pad, 128) XT3 window table in HBM
    vals_hbm, cols_hbm, rowends_hbm, ybase_hbm,
    meta_ref,         # SMEM (W,): packed gather metadata
    # output
    yt_hbm,           # (k_pad, out_len)
    # scratch
    vals_s, cols_s, rowends_s, ybase_s, ywin_s, ywrite_s, xtw_s,
    cs_s, pref_s, carry_s, sems, xsems,
    *, tile_items: int, r_win: int, k_pad: int, meta_mode: str,
    meta_k: int, has_ybase: bool, x_win: int, row_span: int,
):
    T, R = tile_items, r_win
    TE = T + BLOCK
    NREG = TE // LANES          # 128-item registers per tile
    BPT = TE // BLOCK           # 1024-item meta blocks per tile
    KS = k_pad // SUBLANES      # RHS slabs
    K = meta_k
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    slot = jax.lax.rem(t, jnp.int32(2))

    def in_dmas(tile, s):
        nnz0 = tile_nnz_ref[tile]
        row0 = tile_rows_ref[tile]
        annz0 = pl.multiple_of((nnz0 // BLOCK) * BLOCK, BLOCK)
        arow0 = pl.multiple_of((row0 // BLOCK) * BLOCK, BLOCK)
        d = [pltpu.make_async_copy(vals_hbm.at[pl.ds(annz0, TE)],
                                   vals_s.at[pl.ds(s * TE, TE)],
                                   sems.at[0, s]),
             pltpu.make_async_copy(cols_hbm.at[pl.ds(annz0, TE)],
                                   cols_s.at[pl.ds(s * TE, TE)],
                                   sems.at[1, s]),
             pltpu.make_async_copy(rowends_hbm.at[pl.ds(arow0, R)],
                                   rowends_s.at[pl.ds(s * R, R)],
                                   sems.at[2, s])]
        if x_win:
            # MAJOR-dim window-range slice of the 3D table (the dynamic
            # axis is never the lane axis; see module doc)
            cb = cbase_ref[tile]
            d.append(pltpu.make_async_copy(
                xt_ref.at[pl.ds(cb, x_win)],
                xtw_s.at[pl.ds(s * x_win, x_win)],
                xsems.at[s]))
        return d

    def write_dma(tile, s):
        row0 = tile_rows_ref[tile]
        arow0 = pl.multiple_of((row0 // BLOCK) * BLOCK, BLOCK)
        return pltpu.make_async_copy(ywrite_s.at[s],
                                     yt_hbm.at[:, pl.ds(arow0, R)],
                                     sems.at[4, s])

    @pl.when(t == 0)
    def _():
        carry_s[...] = jnp.zeros_like(carry_s)
        if not x_win:
            # stage the whole XT3 table once (a VMEM-pipelined input
            # with a constant index map is re-fetched EVERY grid step)
            dma_x = pltpu.make_async_copy(xt_ref, xtw_s, xsems.at[0])
            dma_x.start()
            dma_x.wait()
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(t + 1 < num_tiles)
    def _():
        for d in in_dmas(t + 1, jax.lax.rem(t + 1, jnp.int32(2))):
            d.start()

    nnz0 = tile_nnz_ref[t]
    nnz1 = tile_nnz_ref[t + 1]
    row0 = tile_rows_ref[t]
    row1 = tile_rows_ref[t + 1]
    annz0 = pl.multiple_of((nnz0 // BLOCK) * BLOCK, BLOCK)
    arow0 = pl.multiple_of((row0 // BLOCK) * BLOCK, BLOCK)
    sh_n = nnz0 - annz0
    sh_r = row0 - arow0
    nloc = nnz1 - nnz0
    rows_done = row1 - row0

    cur = in_dmas(t, slot)
    cur[1].wait()   # cols
    if x_win:
        cur[-1].wait()
        cb_t = cbase_ref[t]

        def xt_win(w):
            # (k_pad, 128) window for global 128-col window id w — one
            # dynamic-MAJOR fetch serves every RHS slab
            rel = jnp.clip(w - cb_t, 0, x_win - 1)
            return xtw_s[slot * x_win + rel]
    else:
        def xt_win(w):
            return xtw_s[jnp.clip(w, 0, xtw_s.shape[0] - 1)]

    cur[0].wait()   # values
    cols2 = cols_s[pl.ds(slot * TE, TE)].reshape(NREG // SUBLANES,
                                                 SUBLANES, LANES)
    vals2 = vals_s[pl.ds(slot * TE, TE)].reshape(NREG // SUBLANES,
                                                 SUBLANES, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)

    # --- products + per-register lane cumsum, all slabs per fetch ------- #
    # cs3 layout: (NREG, k_pad, 128) — item-register MAJOR so the row
    # phase's dynamic chunk visits are major-dim fetches; pref layout per
    # slab: (8, NREG) exclusive
    for g in range(NREG // SUBLANES):          # groups of 8 item-registers
        # one group == one 1024-item meta block (8 registers share it)
        cols_g = cols2[g]                      # (8, 128): 8 item-blocks
        vals_g = vals2[g]
        if meta_mode == "list":
            # K window fetches per BLOCK serve all 8 registers x KS slabs
            wins = []
            for k in range(K):
                w = meta_ref[BPT + g * K + k]
                wins.append((w, xt_win(w)))
        tots = [[] for _ in range(KS)]
        for s8 in range(SUBLANES):             # one 128-item register
            jb = g * SUBLANES + s8
            l_r = jnp.broadcast_to(cols_g[s8:s8 + 1] & (LANES - 1),
                                   (SUBLANES, LANES))
            sc_r = jnp.broadcast_to(cols_g[s8:s8 + 1] >> 7,
                                    (SUBLANES, LANES))
            base = jb * LANES
            valid = (lane + base >= sh_n) & (lane + base < sh_n + nloc)
            if meta_mode == "list":
                xgs = [jnp.zeros((SUBLANES, LANES), jnp.float32)
                       for _ in range(KS)]
                for w, win in wins:
                    hit = sc_r == w
                    for slab in range(KS):
                        g_w = jnp.take_along_axis(
                            win[slab * SUBLANES:(slab + 1) * SUBLANES],
                            l_r, axis=1)
                        xgs[slab] = jnp.where(hit, g_w, xgs[slab])
            else:
                def body(k, accs, l_r=l_r, sc_r=sc_r, g=g):
                    w = meta_ref[BPT + g * K] + k
                    win = xt_win(w)
                    hit = sc_r == w
                    return tuple(
                        jnp.where(hit, jnp.take_along_axis(
                            win[slab * SUBLANES:(slab + 1) * SUBLANES],
                            l_r, axis=1), accs[slab])
                        for slab in range(KS))

                xgs = list(jax.lax.fori_loop(
                    0, meta_ref[g], body,
                    tuple(jnp.zeros((SUBLANES, LANES), jnp.float32)
                          for _ in range(KS))))
            vb = jnp.broadcast_to(vals_g[s8:s8 + 1], (SUBLANES, LANES))
            for slab in range(KS):
                p = jnp.where(valid, xgs[slab] * vb, 0.0)
                acc = p
                sh = 1
                while sh < LANES:
                    acc = acc + jnp.where(lane >= sh,
                                          pltpu.roll(acc, sh, 1), 0.0)
                    sh *= 2
                cs_s[jb, pl.ds(slab * SUBLANES, SUBLANES), :] = acc
                tots[slab].append(acc[:, LANES - 1:LANES])
        for slab in range(KS):
            pref_s[pl.ds(slab * SUBLANES, SUBLANES),
                   pl.ds(g * SUBLANES, SUBLANES)] = jnp.concatenate(
                tots[slab], axis=1)

    # exclusive prefix over register totals, per slab (NREG lanes, static
    # shift-add tree; static shifts are safe on non-pow2 lane counts)
    reg_lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, NREG), 1)
    for slab in range(KS):
        sl = pl.ds(slab * SUBLANES, SUBLANES)
        tot = pref_s[sl, pl.ds(0, NREG)]
        ex = jnp.where(reg_lane == 0, 0.0, pltpu.roll(tot, 1, 1))
        sh = 1
        while sh < NREG:
            ex = ex + jnp.where(reg_lane >= sh, pltpu.roll(ex, sh, 1), 0.0)
            sh *= 2
        pref_s[sl, pl.ds(0, NREG)] = ex

    # --- per-row sums at row-end positions, per slab --------------------- #
    cur[2].wait()   # row ends
    rowe2 = rowends_s[pl.ds(slot * R, R)].reshape(R // LANES, LANES)
    rl = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, R), 1)

    @pl.when(t > 0)
    def _():
        # Window advance WITHOUT a dynamic lane roll: only the FIRST
        # 1024-row block of the new window can hold contributions from
        # earlier tiles (the merge split guarantees exactly one boundary
        # block), so one 1024-aligned dynamic lane-slice copy replaces
        # the whole-window rotate.  d_r == R means zero overlap.
        arow_prev = pl.multiple_of(
            (tile_rows_ref[jnp.maximum(t - 1, 0)] // BLOCK) * BLOCK, BLOCK)
        d_r = arow0 - arow_prev                # multiple of 1024 lanes
        cp = pl.multiple_of(jnp.minimum(d_r, R - BLOCK), BLOCK)
        ov = jnp.where(d_r < R, ywin_s[:, pl.ds(cp, BLOCK)], 0.0)
        ywin_s[:, pl.ds(0, BLOCK)] = ov
        if R > BLOCK:
            ywin_s[:, pl.ds(BLOCK, R - BLOCK)] = jnp.zeros(
                (k_pad, R - BLOCK), jnp.float32)

    parts = [[] for _ in range(KS)]
    pparts = [[] for _ in range(KS)]
    for rb in range(R // LANES):
        ends1 = jnp.clip(rowe2[rb:rb + 1] - nnz0, 0, nloc) + sh_n
        pos1 = jnp.clip(ends1 - 1, 0, TE - 1)              # (1, 128)
        posb = jnp.broadcast_to(pos1, (SUBLANES, LANES))
        lposb = posb & (LANES - 1)
        regb = posb >> 7
        c_lo = jnp.min(pos1) >> 7
        c_hi = jnp.max(pos1) >> 7
        cnt = c_hi - c_lo + 1

        def rvisit(c, accs, valid, lposb=lposb, regb=regb):
            # ONE dynamic-major fetch of register c's cumsum block
            # serves every slab
            win = cs_s[jnp.clip(c, 0, NREG - 1)]           # (k_pad, 128)
            hit = regb == c
            if valid is not None:
                hit = hit & valid
            return tuple(
                jnp.where(hit, jnp.take_along_axis(
                    win[slab * SUBLANES:(slab + 1) * SUBLANES],
                    lposb, axis=1), accs[slab])
                for slab in range(KS))

        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
        accs = tuple(zero for _ in range(KS))
        # static unroll up to the per-matrix span cap (dynamic
        # fori costs ~60 cycles/iteration of pure overhead —
        # ~800 iterations per tile dominated the first hardware run)
        head = row_span if 0 < row_span <= 16 else 4
        for k in range(head):
            c = jnp.minimum(c_lo + k, NREG - 1)
            valid = jnp.full((SUBLANES, LANES), k < cnt)
            accs = rvisit(c, accs, valid)
        if not (0 < row_span <= 16):
            accs = jax.lax.fori_loop(
                jnp.minimum(c_lo + head, c_hi + 1), c_hi + 1,
                lambda c, a: rvisit(c, a, None), accs)
        validb = jnp.broadcast_to(ends1 > 0, (SUBLANES, LANES))
        regc = jnp.minimum(regb, NREG - 1)
        for slab in range(KS):
            # register prefixes: NREG <= 128, so the whole per-slab
            # prefix table is one (8, 128) register — a single
            # lane-gather replaces the per-register accumulate
            pref_tab = pref_s[pl.ds(slab * SUBLANES, SUBLANES),
                              pl.ds(0, LANES)]
            acc_p = jnp.take_along_axis(pref_tab, regc, axis=1)
            parts[slab].append(jnp.where(validb, accs[slab], 0.0))
            pparts[slab].append(jnp.where(validb, acc_p, 0.0))

    for slab in range(KS):
        sl = pl.ds(slab * SUBLANES, SUBLANES)
        cs_end = jnp.concatenate(parts[slab], axis=1)       # (8, R) local
        pf_end = jnp.concatenate(pparts[slab], axis=1)      # reg prefixes

        # two separate first differences (lanes): rows within one
        # 128-item register cancel the prefix exactly (numerics parity
        # with csrmv's two-difference form)
        def shift1(a):
            prev = pltpu.roll(a, 1, 1)
            return jnp.where(rl == 0, 0.0, prev)

        rowsum = (cs_end - shift1(cs_end)) + (pf_end - shift1(pf_end))

        carry_in = jnp.broadcast_to(carry_s[sl, 0:1], (SUBLANES, R))
        rowsum = rowsum + jnp.where(rl == sh_r, carry_in, 0.0)
        row_mask = (rl >= sh_r) & (rl < sh_r + rows_done)

        # tile total per kk = exclusive prefix of last register + its sum
        last_reg = cs_s[NREG - 1, sl, :]
        total = (pref_s[sl, pl.ds(NREG - 1, 1)]
                 + last_reg[:, LANES - 1:LANES])            # (8, 1)
        last_sel = rl == sh_r + rows_done - 1
        cs_last = jnp.sum(jnp.where(last_sel, cs_end + pf_end, 0.0),
                          axis=1, keepdims=True)            # (8, 1)
        ends_r = jnp.broadcast_to(
            jnp.clip(rowe2.reshape(1, R) - nnz0, 0, nloc) + sh_n,
            (SUBLANES, R))
        end_last = jnp.max(jnp.where(last_sel, ends_r, jnp.int32(-1)))
        carry_s[sl, 0:1] = jnp.where(
            rows_done > 0,
            jnp.where(end_last >= sh_n + nloc, 0.0, total - cs_last),
            carry_s[sl, 0:1] + total)

        # --- rolling YT window: add completed rows ----------------------- #
        # beta*Y_in is applied OUTSIDE the kernel (XLA post-add): the
        # in-kernel ybase window needed a dynamic minor-dim DMA slice,
        # which crashes the TPU worker (same class as the round-1 flat
        # 1D DMA crash)
        basew = jnp.zeros((SUBLANES, R), jnp.float32)

        @pl.when(t == 0)
        def _():
            ywin_s[sl, pl.ds(0, R)] = basew

        @pl.when(t > 0)
        def _():
            # window advance kept only the overlap block at position 0
            # (zeros elsewhere); merge the base everywhere past it.  The
            # overlap block already contains its base from the previous
            # tile's merge (same absolute rows, same y_in values).
            arow_prev = pl.multiple_of(
                (tile_rows_ref[jnp.maximum(t - 1, 0)] // BLOCK) * BLOCK,
                BLOCK)
            d_r = arow0 - arow_prev
            cur_w = ywin_s[sl, pl.ds(0, R)]
            keep = (rl < BLOCK) & (d_r < R)
            ywin_s[sl, pl.ds(0, R)] = jnp.where(keep, cur_w, basew)

        ywin_s[sl, pl.ds(0, R)] = (ywin_s[sl, pl.ds(0, R)]
                                   + jnp.where(row_mask, rowsum, 0.0))

    # --- staged write of all slabs --------------------------------------- #
    @pl.when(t > 0)
    def _():
        write_dma(jnp.maximum(t - 1, 0), 1 - slot).wait()

    ywrite_s[pl.ds(slot, 1)] = ywin_s[...][None]
    write_dma(t, slot).start()

    @pl.when(t == num_tiles - 1)
    def _():
        write_dma(t, slot).wait()


# ---------------------------------------------------------------------- #
# Host-side wrapper
# ---------------------------------------------------------------------- #

def make_mm_plan(num_rows, num_cols, num_nonzeros, k,
                 row_end_offsets=None, col_indices=None,
                 tile_items=None, vmem_bytes=None) -> SpmvPlan:
    """Plan for the wide SpMM kernel: tile size scaled so the per-slab
    cumsum tables fit VMEM, r_win rounded to a power of two (the rolling
    YT window uses a dynamic lane roll, modular only on pow2 sizes)."""
    import dataclasses

    from merge_spmv_tpu.ops.plan import make_plan

    k_pad = SUBLANES * -(-int(k) // SUBLANES)
    if tile_items is None:
        # cs tables are k_pad*(T+1024)*4 bytes (budget ~4 MB); NREG must
        # stay <= 128 so the register-prefix table fits one (8, 128)
        # register for the row-phase lane-gather
        tile_items = max(2048, min(15360,
                                   ((1 << 20) // k_pad - 1024) // 1024
                                   * 1024))
    kw = {} if vmem_bytes is None else {"vmem_bytes": vmem_bytes}
    plan = make_plan(num_rows, num_cols, num_nonzeros, dtype="float32",
                     tile_items=tile_items, num_rhs=int(k),
                     row_end_offsets=row_end_offsets,
                     col_indices=col_indices, **kw)
    if plan.x_win and 2 * plan.x_win * LANES * 4 * k_pad > (
            (vmem_bytes or 16 * 1024 * 1024) // 4):
        # k_pad-wide streamed XT windows exceed the budget: the wide
        # kernel cannot run; callers fall back to the per-column loop
        plan = dataclasses.replace(plan, backend="xla")
    # row_span for the wide kernel is in 128-item REGISTERS per 128
    # consecutive rows (csrmv's is 1024-blocks per 1024 rows — reusing it
    # under-counts locally dense row runs and drops gather visits)
    row_span_mm = 0
    if row_end_offsets is not None:
        import numpy as np
        rowe = np.asarray(row_end_offsets, dtype=np.int64)
        if len(rowe) <= LANES:
            span = int(rowe[-1]) if len(rowe) else 0
        else:
            span = int((rowe[LANES:] - rowe[:-LANES]).max())
        row_span_mm = min(span // LANES + 2,
                          (plan.tile_items + 1024) // LANES)
    r2 = 1 << (int(plan.r_win) - 1).bit_length()
    return dataclasses.replace(plan, r_win=r2, row_span=row_span_mm)


def _csrmm_core(plan: SpmvPlan, k_pad: int, values_p, cols_p, rowends_p,
                tile_rows, tile_nnz, cbase, meta, xt_scaled, yt_base,
                *, meta_is_list: bool, interpret, x_resident: bool):
    T = plan.tile_items
    R = plan.r_win
    TE = T + BLOCK
    if TE // LANES > LANES:
        raise ValueError(
            f"csrmm_wide needs tile_items <= 15360 (NREG <= 128 so the "
            f"register-prefix table is one register); got {T} "
            f"(use make_mm_plan)")
    num_tiles = plan.num_tiles
    K = max(1, plan.meta_k) if meta_is_list else 1
    meta_mode = "list" if meta_is_list else "range"
    has_ybase = False          # beta*Y_in is an XLA post-add (see kernel)
    W = meta_width(T, K)
    NREG = TE // LANES
    NW = max(1, BLOCK * max(1, -(-plan.num_cols // BLOCK)) // LANES)
    x_win = 0 if x_resident else plan.x_win
    # XT3 scratch: whole table when resident (staged once at t==0),
    # double-buffered per-tile window ranges when streamed
    xtw_rows = NW if x_resident else 2 * x_win

    out_len = -(-(plan.num_rows + R + BLOCK) // BLOCK) * BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # XT3 (NW, k_pad, 128)
            pl.BlockSpec(memory_space=pl.ANY),    # values
            pl.BlockSpec(memory_space=pl.ANY),    # cols
            pl.BlockSpec(memory_space=pl.ANY),    # row ends
            pl.BlockSpec(memory_space=pl.ANY),    # YT base
            pl.BlockSpec((W,), lambda t, *_: (t,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * TE,), jnp.float32),            # values windows
            pltpu.VMEM((2 * TE,), jnp.int32),              # cols windows
            pltpu.VMEM((2 * R,), jnp.int32),               # row-end windows
            pltpu.VMEM((k_pad, LANES), jnp.float32),       # (unused ybase slot)
            pltpu.VMEM((k_pad, R), jnp.float32),           # YT window
            pltpu.VMEM((2, k_pad, R), jnp.float32),        # write staging
            pltpu.VMEM((xtw_rows, k_pad, LANES),
                       jnp.float32),                       # XT3 windows/table
            pltpu.VMEM((NREG, k_pad, LANES), jnp.float32),  # cumsum tables
            pltpu.VMEM((k_pad, LANES), jnp.float32),       # register prefixes
                                                           # (NREG <= 128)
            pltpu.VMEM((k_pad, LANES), jnp.float32),       # carries
            pltpu.SemaphoreType.DMA((5, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _spmm_kernel, tile_items=T, r_win=R, k_pad=k_pad,
        meta_mode=meta_mode, meta_k=K, has_ybase=has_ybase,
        x_win=x_win, row_span=plan.row_span)

    if yt_base is None:
        yt_base = jnp.zeros((k_pad, LANES), jnp.float32)

    yt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, out_len), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # sequential: carry chain
        ),
        interpret=bool(interpret),
    )(tile_rows, tile_nnz, cbase, xt_scaled, values_p, cols_p, rowends_p,
      yt_base, meta)
    return yt[:, :plan.num_rows]


@functools.partial(jax.jit,
                   static_argnames=("plan", "k_pad", "meta_is_list",
                                    "has_y", "interpret", "x_resident"))
def _csrmm_call(plan, k_pad, values_p, cols_p, rowends_p, tile_rows,
                tile_nnz, cbase, meta, X, Y_in, alpha, beta, *,
                meta_is_list, has_y, interpret, x_resident):
    # XT3 (NW, k_pad, 128): 128-column windows MAJOR, padded to whole
    # 1024-column chunks so window reads/DMAs never run off the table
    # (same window grid as csrmv's packed x)
    Cp = BLOCK * max(1, -(-plan.num_cols // BLOCK))
    C, k = X.shape
    xt = jnp.swapaxes(X.astype(jnp.float32), 0, 1) * alpha
    xt = jnp.pad(xt, ((0, k_pad - k), (0, Cp - C)))
    xt = jnp.moveaxis(xt.reshape(k_pad, Cp // LANES, LANES), 1, 0)
    yt = _csrmm_core(plan, k_pad, values_p, cols_p, rowends_p, tile_rows,
                     tile_nnz, cbase, meta, xt, None,
                     meta_is_list=meta_is_list, interpret=interpret,
                     x_resident=x_resident)
    Y = jnp.swapaxes(yt, 0, 1)[:, :k]
    if has_y:
        # beta*Y_in applied outside the kernel: the in-kernel base
        # window needed a dynamic minor-dim DMA (TPU worker crash)
        Y = Y + beta * Y_in.astype(jnp.float32)
    return Y


def prepare_csrmm(plan: SpmvPlan, values, row_end_offsets, col_indices,
                  meta=None) -> PreparedCsrmv:
    """Per-matrix prep (shared machinery with csrmv)."""
    cbase = None
    if isinstance(meta, tuple):
        meta, cbase = meta
    provided = meta is not None
    with jax.enable_x64(False):
        values_p, cols_p, rowends_p = pad_csr_arrays(
            plan, values, row_end_offsets, col_indices)
        tile_rows, tile_nnz, cbase, meta, tile_flags = jax.jit(
            _prepare_traced, static_argnums=0)(plan, cols_p, rowends_p,
                                               meta, cbase)
    return PreparedCsrmv(values_p, cols_p, rowends_p, tile_rows, tile_nnz,
                         cbase, meta,
                         meta_is_list=bool(plan.meta_k) and provided,
                         tile_flags=tile_flags)


def csrmm_wide_prepared(plan: SpmvPlan, prep: PreparedCsrmv, X,
                        Y_in=None, alpha=1.0, beta=0.0,
                        interpret: bool = False):
    """Y = alpha*A*X + beta*Y_in, X [num_cols, k], k ≤ 128."""
    k = X.shape[1]
    if k > LANES:
        raise ValueError("csrmm_wide handles k <= 128 per pass")
    k_pad = SUBLANES * -(-k // SUBLANES)
    x_resident = plan.x_win == 0
    with jax.enable_x64(False):
        return _csrmm_call(
            plan, k_pad, prep.values_p, prep.cols_p, prep.rowends_p,
            prep.tile_rows, prep.tile_nnz, prep.cbase, prep.meta,
            X, Y_in, jnp.asarray(alpha, jnp.float32),
            jnp.asarray(beta, jnp.float32),
            meta_is_list=prep.meta_is_list, has_y=Y_in is not None,
            interpret=bool(interpret), x_resident=x_resident)


def csrmm_wide(plan: SpmvPlan, values, row_end_offsets, col_indices, X,
               Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
               meta=None):
    """One-shot convenience wrapper (prep + call)."""
    prep = prepare_csrmm(plan, values, row_end_offsets, col_indices,
                         meta=meta)
    return csrmm_wide_prepared(plan, prep, X, Y_in=Y_in, alpha=alpha,
                               beta=beta, interpret=interpret)
