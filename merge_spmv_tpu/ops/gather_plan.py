"""Gather metadata for the merge-path Pallas kernel.

The performance crux of CsrMV on TPU is the random gather ``x[col]``
(SURVEY.md §7.3): the VPU has no hardware gather beyond register-local
(8, 128) lane/sublane shuffles, so the kernel fetches one 128-column window
of x at a time and lane-gathers within it.  The cost is therefore
proportional to the number of *windows visited per 1024-nonzero block*.

This module precomputes, per aligned 1024-nonzero block, the list of
distinct 128-wide column windows ("subchunks", id = col >> 7) the block
touches:

* ``gather_meta_np`` — host (NumPy) construction at plan time.  Fully
  vectorized: sort each block's subchunk ids, keep first occurrences.
  This is *metadata*, not a format conversion — values/col_indices are
  untouched (the reference's no-preprocessing brand, README.md:5-7); it
  plays the role the per-SM tuning policy ladder plays in the reference
  dispatch (dispatch_spmv_orig.cuh:262-445): one-time, per-problem
  planning.
* ``gather_meta_range`` — jit-traceable fallback when the host column
  array is unavailable: per-block [lo, hi] subchunk *range* (K = 1, the
  kernel walks lo..lo+cnt-1).  Exact for banded matrices; degrades to a
  full-range sweep on scattered ones.

Block b covers nonzeros [1024*b, 1024*(b+1)) — globally aligned, so the
same metadata serves every tile that overlaps the block (tile windows are
aligned down to 1024, csrmv_pallas.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gather_meta_np", "gather_meta_range", "row_window_np",
           "cluster_meta_np", "pack_tile_cmeta_np", "cmeta_width",
           "BLOCK", "SUBCHUNK"]

BLOCK = 1024     # nonzeros per gather block == one (8, 128) vector register
SUBCHUNK = 128   # columns per gather window == one lane-gather table


def _pad_blocks(ids: np.ndarray, num_blocks: int) -> np.ndarray:
    """Pad the per-nonzero id array to (num_blocks, BLOCK), repeating the
    last id so padding never adds a distinct window."""
    n = ids.shape[0]
    pad = num_blocks * BLOCK - n
    if pad:
        fill = ids[-1] if n else 0
        ids = np.concatenate([ids, np.full(pad, fill, ids.dtype)])
    return ids.reshape(num_blocks, BLOCK)


def gather_meta_np(col_indices, num_nonzeros: int, pad_blocks: int = 0,
                   k_cap: int | None = None, shift: int = 7):
    """Distinct gather-window lists per 1024-nnz block.

    ``shift`` selects the window granularity: 7 → 128-column subchunks
    (one lane-gather per visit), 10 → 1024-column chunks (compose-8 per
    visit; fewer visits for scattered columns).

    Returns (cnt, lst): cnt[b] = number of distinct windows of block b,
    lst[b, :cnt[b]] = their ids ascending; K = lst.shape[1] = max(cnt).
    ``pad_blocks`` appends zero-count blocks so kernel windows may run past
    the last real block.  If ``k_cap`` is given and max(cnt) exceeds it,
    returns None (caller falls back to another strategy).
    """
    cols = np.asarray(col_indices[:num_nonzeros], dtype=np.int64)
    nb = max(1, -(-num_nonzeros // BLOCK))
    sc = _pad_blocks(cols >> shift, nb).astype(np.int32)
    sc.sort(axis=1)
    first = np.ones_like(sc, dtype=bool)
    first[:, 1:] = sc[:, 1:] != sc[:, :-1]
    cnt = first.sum(axis=1).astype(np.int32)
    k = int(cnt.max()) if num_nonzeros else 1
    if k_cap is not None and k > k_cap:
        return None
    # scatter first-occurrence values into compact per-row lists;
    # -1-padded: the kernel's unrolled gather masks on (col>>7) == id, so a
    # sentinel that can never match makes padded visits no-ops
    lst = np.full((nb, k), -1, dtype=np.int32)
    rows, colpos = np.nonzero(first)
    dest = (np.cumsum(first.ravel()).reshape(first.shape) - 1
            - np.concatenate([[0], np.cumsum(cnt)[:-1]])[:, None])
    lst[rows, dest[first]] = sc[first]
    if pad_blocks:
        cnt = np.concatenate([cnt, np.zeros(pad_blocks, np.int32)])
        lst = np.concatenate([lst, np.full((pad_blocks, k), -1, np.int32)])
    return cnt, lst


def gather_meta_group_np(col_indices, num_nonzeros: int, group_blocks: int,
                         pad_blocks: int = 0, k_cap: int | None = None,
                         shift: int = 7):
    """Sliding union gather lists over ``group_blocks`` consecutive blocks.

    glst[b] holds the distinct windows of blocks [b, b + group_blocks)
    for EVERY aligned 1024-nnz block start b — overlapping on purpose, so
    a tile whose first block is any 1024-aligned position can address the
    union list of each of its block groups directly.

    Motivation (grid3d100 measured): consecutive blocks share ~90 % of
    their window lists (a block advances the column window by ~1.1
    subchunks), and the per-visit cost is dominated by the dynamic
    sublane fetch + broadcast, which a group visit issues ONCE for
    group_blocks blocks.  The union width K_G grows only by the slide
    (~1 per extra block), so group visits cut the fetch count by ~G while
    the select work stays proportional to real matches.

    Returns (cnt, glst) shaped like gather_meta_np's output (cnt[b] =
    distinct count of group b, -1-padded lists), or None past ``k_cap``.
    """
    cols = np.asarray(col_indices[:num_nonzeros], dtype=np.int64)
    nb = max(1, -(-num_nonzeros // BLOCK))
    sc = _pad_blocks(cols >> shift, nb).astype(np.int32)
    # pad group_blocks - 1 trailing blocks (repeat last id: no new window)
    tailpad = np.broadcast_to(sc[-1:, -1:],
                              (group_blocks - 1, BLOCK)).astype(np.int32)
    sc_ext = np.concatenate([sc, tailpad])
    sw = np.lib.stride_tricks.sliding_window_view
    grp = np.ascontiguousarray(
        sw(sc_ext, (group_blocks, BLOCK)).reshape(
            nb, group_blocks * BLOCK))
    grp.sort(axis=1)
    first = np.ones_like(grp, dtype=bool)
    first[:, 1:] = grp[:, 1:] != grp[:, :-1]
    cnt = first.sum(axis=1).astype(np.int32)
    k = int(cnt.max()) if num_nonzeros else 1
    if k_cap is not None and k > k_cap:
        return None
    lst = np.full((nb, k), -1, dtype=np.int32)
    rows, colpos = np.nonzero(first)
    dest = (np.cumsum(first.ravel()).reshape(first.shape) - 1
            - np.concatenate([[0], np.cumsum(cnt)[:-1]])[:, None])
    lst[rows, dest[first]] = grp[first]
    if pad_blocks:
        cnt = np.concatenate([cnt, np.zeros(pad_blocks, np.int32)])
        lst = np.concatenate([lst, np.full((pad_blocks, k), -1, np.int32)])
    return cnt, lst


def cluster_meta_np(col_indices, num_nonzeros: int, num_sub: int,
                    c_cap: int = 8, w_cap: int = 8, shift: int = 7,
                    meta=None):
    """Greedy 8-window interval cover of each block's distinct window list
    (the "cluster" gather mode).

    The fine list mode pays one dynamic sublane fetch + broadcast PER
    VISITED WINDOW (~5 of the measured ~8 regops/visit on grid3d100).
    Distinct windows cluster into a few contiguous runs on
    stencil/banded/FEM matrices (grid3d100: 8.5 distinct windows in
    exactly 3 runs per block) — so fetch 8 CONSECUTIVE window rows once
    per cluster and serve offsets 0..span_c-1 of the fetched register
    with STATIC sublane slices (round 4: the round-3 dynamic barrel-roll
    serve measured 1.35x SLOWER than the list mode on chip; static slices
    compile to register moves and need no per-visit roll or fetch).

    Returns (bases (nb, C), rels (nb, C, W), widths tuple(C),
    spans tuple(C)) int32 with -1 sentinels, or None when any block needs
    more than ``c_cap`` clusters.  Clusters are sorted per block by visit
    count DESCENDING; ``widths[c]`` is the max visit count of slot c over
    all blocks (governs the packed-record layout) and ``spans[c]`` is the
    max rel+1 — the kernel statically serves every offset in
    [base_c, base_c + spans[c]); offsets not in the block's real list
    match no element and are harmless no-ops.  Bases are pre-clamped to
    [0, num_sub - 8] so the kernel's 8-row fetch can never run off the
    packed x table; rels are relative to the CLAMPED base (in [0, 8)).
    """
    if meta is None:
        meta = gather_meta_np(col_indices, num_nonzeros, shift=shift)
    cnt, lst = meta
    nb, K = lst.shape
    base_hi = max(0, num_sub - 8)
    bases = np.full((nb, c_cap), -1, np.int32)
    rels = np.full((nb, c_cap, w_cap), -1, np.int32)
    cur_c = np.full(nb, -1, np.int64)         # current cluster index
    cur_base = np.full(nb, -(2 ** 30), np.int64)
    cur_w = np.zeros(nb, np.int64)            # visits used in cur cluster
    rows = np.arange(nb)
    for j in range(K):
        v = lst[:, j].astype(np.int64)
        valid = v >= 0
        new_c = valid & ((cur_c < 0) | (v >= cur_base + 8)
                         | (cur_w >= w_cap))
        cur_c = cur_c + new_c
        if int(cur_c.max(initial=-1)) >= c_cap:
            return None
        cur_w = np.where(new_c, 0, cur_w)
        cur_base = np.where(new_c, np.minimum(v, base_hi), cur_base)
        cc = np.clip(cur_c, 0, c_cap - 1)
        bset = rows[new_c]
        bases[bset, cc[new_c]] = cur_base[new_c]
        rset = rows[valid]
        rels[rset, cc[valid], cur_w[valid]] = (v - cur_base)[valid]
        cur_w = cur_w + valid
    c_used = int((bases >= 0).sum(axis=1).max(initial=0)) or 1
    w_used = int((rels >= 0).sum(axis=2).max(initial=0)) or 1
    bases = bases[:, :c_used]
    rels = rels[:, :c_used, :w_used]
    # sort clusters by visit count descending; per-slot width caps
    counts = (rels >= 0).sum(axis=2)
    order = np.argsort(-counts, axis=1, kind="stable")
    bases = np.take_along_axis(bases, order, axis=1)
    rels = np.take_along_axis(rels, order[:, :, None], axis=1)
    widths = tuple(int(x) for x in
                   np.maximum((rels >= 0).sum(axis=2).max(axis=0), 1))
    spans = tuple(int(x) + 1 for x in
                  np.maximum(rels.max(axis=(0, 2)), 0))
    return bases, rels, widths, spans


def cmeta_width(tile_items: int, widths) -> int:
    """Width of one tile's packed cluster-gather record (1024-padded):
    per block, for each cluster slot c: [base_c, rel_0..rel_{widths[c]-1}]."""
    bpt = (tile_items + BLOCK) // BLOCK
    rec = len(widths) + sum(widths)
    return -(-(bpt * rec) // 1024) * 1024


def pack_tile_cmeta_np(bases, rels, widths, tile_nnz,
                       tile_items: int) -> np.ndarray:
    """Pack cluster metadata into the flat per-tile SMEM layout: block r's
    record is the per-slot concatenation [base_c, rel_{c,0..W_c-1}]."""
    nb, c = bases.shape
    bpt = (tile_items + BLOCK) // BLOCK
    parts = []
    for ci in range(c):
        parts.append(bases[:, ci:ci + 1])
        parts.append(rels[:, ci, :widths[ci]])
    rec = np.concatenate(parts, axis=1).astype(np.int32)  # (nb, recw)
    recw = rec.shape[1]
    # pad blocks so kernel windows may run past the last real block
    rec = np.concatenate([rec, np.full((bpt + 1, recw), -1, np.int32)])
    wdt = cmeta_width(tile_items, widths)
    num_tiles = len(tile_nnz) - 1
    b0 = (np.asarray(tile_nnz[:-1], np.int64) // BLOCK)
    idx = np.minimum(b0[:, None] + np.arange(bpt), len(rec) - 1)
    meta = np.full((num_tiles, wdt), -1, np.int32)
    meta[:, :bpt * recw] = rec[idx].reshape(num_tiles, -1)
    return meta.ravel()


def gmeta_width(tile_items: int, k: int, group_blocks: int) -> int:
    """Width of one tile's packed group-gather record (1024-padded)."""
    bpt = (tile_items + BLOCK) // BLOCK
    ng = -(-bpt // group_blocks)
    return -(-(ng * k) // 1024) * 1024


def pack_tile_gmeta_np(glst, tile_nnz, tile_items: int,
                       group_blocks: int) -> np.ndarray:
    """Pack per-group union lists into the flat per-tile SMEM layout:
    [grp_0_0..grp_0_{K-1}, grp_1_0, ...] for the tile's NG groups, padded
    to a 1024 multiple.  Group g of a tile starting at aligned block b0
    uses the global sliding list at b0 + g*group_blocks."""
    k = glst.shape[1]
    bpt = (tile_items + BLOCK) // BLOCK
    ng = -(-bpt // group_blocks)
    w = gmeta_width(tile_items, k, group_blocks)
    num_tiles = len(tile_nnz) - 1
    b0 = (np.asarray(tile_nnz[:-1], np.int64) // BLOCK)
    idx = np.minimum(b0[:, None] + np.arange(ng) * group_blocks,
                     len(glst) - 1)
    meta = np.full((num_tiles, w), -1, np.int32)
    meta[:, :ng * k] = glst[idx].reshape(num_tiles, ng * k)
    return meta.ravel()


def gather_meta_range(cols_padded, num_nonzeros: int, num_blocks: int,
                      shift: int = 10):
    """Device (jit-traceable) range metadata: cnt[b] = hi-lo+1, lst[b,0]=lo.

    ``cols_padded`` must be padded to at least num_blocks*BLOCK entries with
    values that do not extend the ranges (csrmv_pallas pads with the last
    real column).
    """
    import jax.numpy as jnp

    sc = (cols_padded[:num_blocks * BLOCK] >> shift).reshape(num_blocks,
                                                             BLOCK)
    if num_nonzeros < num_blocks * BLOCK:
        # mask padding in the final block to the block's first valid entry
        j = jnp.arange(num_blocks * BLOCK, dtype=jnp.int32).reshape(
            num_blocks, BLOCK)
        valid = j < num_nonzeros
        anchor = sc[:, :1]
        sc = jnp.where(valid, sc, anchor)
    lo = sc.min(axis=1).astype(jnp.int32)
    hi = sc.max(axis=1).astype(jnp.int32)
    cnt = (hi - lo + 1).astype(jnp.int32)
    return cnt, lo[:, None]


def meta_width(tile_items: int, k: int) -> int:
    """Width of one tile's packed gather-meta record: [cnt_0..cnt_{BPT-1},
    lst_0_0..lst_0_{K-1}, lst_1_0, ...].  Padded to 1024 entries so the
    per-tile SMEM block matches XLA's 1D int32 tiling ({0:T(1024)})."""
    bpt = (tile_items + BLOCK) // BLOCK
    return -(-(bpt * (1 + k)) // 1024) * 1024


def pack_tile_meta_np(cnt, lst, tile_nnz, tile_items: int) -> np.ndarray:
    """Pack per-block gather metadata into the flat per-tile SMEM layout.

    cnt (nblocks,), lst (nblocks, K) from gather_meta_np (already padded by
    at least BPT blocks); tile_nnz (num_tiles+1,) from the host tile split.
    Returns int32 (num_tiles * meta_width,).
    """
    bpt = (tile_items + BLOCK) // BLOCK
    k = lst.shape[1]
    w = meta_width(tile_items, k)
    num_tiles = len(tile_nnz) - 1
    b0 = (np.asarray(tile_nnz[:-1], np.int64) // BLOCK)
    idx = np.minimum(b0[:, None] + np.arange(bpt), len(cnt) - 1)
    meta = np.zeros((num_tiles, w), np.int32)
    meta[:, :bpt] = cnt[idx]
    meta[:, bpt:bpt + bpt * k] = lst[idx].reshape(num_tiles, bpt * k)
    return meta.ravel()


def pack_tile_meta(cnt, lst, tile_nnz, tile_items: int):
    """Device (jit-traceable) version of pack_tile_meta_np."""
    import jax.numpy as jnp

    bpt = (tile_items + BLOCK) // BLOCK
    k = lst.shape[1]
    w = meta_width(tile_items, k)
    num_tiles = tile_nnz.shape[0] - 1
    b0 = tile_nnz[:-1] // BLOCK
    idx = jnp.minimum(b0[:, None] + jnp.arange(bpt, dtype=jnp.int32),
                      cnt.shape[0] - 1)
    meta = jnp.zeros((num_tiles, w), jnp.int32)
    meta = meta.at[:, :bpt].set(jnp.take(cnt, idx, axis=0))
    meta = meta.at[:, bpt:bpt + bpt * k].set(
        jnp.take(lst, idx, axis=0).reshape(num_tiles, bpt * k))
    return meta.ravel()


def tile_col_windows_np(col_indices, num_nonzeros: int, tile_items: int):
    """Per-block subchunk min/max for the x-window machinery.

    Returns (bmin, bmax) over aligned 1024-nnz blocks (subchunk units)."""
    cols = np.asarray(col_indices[:num_nonzeros], dtype=np.int64)
    nb = max(1, -(-num_nonzeros // BLOCK))
    sc = _pad_blocks(cols >> 7, nb).astype(np.int64)
    return sc.min(axis=1), sc.max(axis=1)


def tile_col_meta_np(col_indices, num_nonzeros: int, row_end_offsets,
                     tile_items: int):
    """(cbase_sub[num_tiles + 1] int32, x_win_sub int) for the plan.

    For tile t the kernel DMAs x rows [cbase_sub[t], cbase_sub[t] +
    x_win_sub) of the packed (num_sub, 128) x table — covering every
    column the tile's OWN nonzeros touch.  The window is computed over
    the tile's exact block range [tile_nnz[t] >> 10, ceil(tile_nnz[t+1] /
    1024)) — not a worst-case tile_items-wide span: a row-dominated tile
    holds far fewer nonzero blocks than the bound, and (stacked-band
    matrices, ops/split.py) a worst-case span would leak into the next
    band's column range and blow the streaming budget.  Bases are
    8-subchunk (1024-column) aligned so coarse chunk visits stay aligned.
    """
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np

    _, tile_nnz = merge_tile_coordinates_np(row_end_offsets, num_nonzeros,
                                            tile_items)
    bmin, bmax = tile_col_windows_np(col_indices, num_nonzeros, tile_items)
    nb = len(bmin)
    t_nnz = np.asarray(tile_nnz, np.int64)
    b0 = np.minimum(t_nnz[:-1] // BLOCK, nb - 1)
    b1 = np.clip(-(-t_nnz[1:] // BLOCK), b0 + 1, nb)   # exclusive, >= b0+1
    # segmented min/max over [b0[t], b1[t]) via reduceat on interleaved
    # boundaries (ranges may share one straddling block — reduceat
    # handles the overlap since each tile's range is reduced separately).
    # One identity sentinel is appended so b1 == nb is a valid reduceat
    # index; even-position segments [b0, b1) never reach it.
    idx = np.empty(2 * len(b0), np.int64)
    idx[0::2] = b0
    idx[1::2] = b1
    bmin_e = np.concatenate([bmin, [2**31]])
    bmax_e = np.concatenate([bmax, [-2**31]])
    win_min = np.minimum.reduceat(bmin_e, idx)[0::2]
    win_max = np.maximum.reduceat(bmax_e, idx)[0::2]
    cmin = (win_min // 8) * 8                          # 1024-col aligned
    span = win_max - cmin + 1
    x_win_sub = int(-(-int(span.max()) // 8) * 8) if len(span) else 8
    cbase = np.concatenate([cmin, [0]]).astype(np.int32)
    return cbase, max(8, x_win_sub)


def row_meta_np(row_end_offsets, num_nonzeros: int, tile_items: int,
                r_win: int, k_cap: int = 16, k_force: int = 0):
    """Distinct cumsum-chunk lists per (tile, 1024-row group) for the
    kernel's row phase — the row-side analog of ``gather_meta_np``.

    The row phase gathers the cumsum table at each row's end position.
    Visiting the position RANGE [c_lo, c_hi] is catastrophic under skew: a
    hub row makes its group's range span hundreds of chunks while the
    group's 1024 ends touch only ~10 DISTINCT chunks (measured: the whole
    0.68-vs-1.0 round-2 skew gap was this range walk).  These lists let
    the kernel statically unroll exactly the distinct visits,
    sentinel-padded with -1.

    Returns (packed int32 (num_tiles * Wr,), k) with
    Wr = ceil(groups * k / 1024) * 1024, or (None, 0) if any group's
    distinct count exceeds ``k_cap`` (kernel falls back to the range
    walk).  Only rows that can contribute to a tile's output (plus one
    predecessor for the first-difference) constrain the lists; padded
    rows' positions are excluded (their gathers are masked out anyway).
    """
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np

    tile_rows, tile_nnz = merge_tile_coordinates_np(
        row_end_offsets, num_nonzeros, tile_items)
    num_tiles = len(tile_rows) - 1
    T = tile_items
    TE = T + BLOCK
    nrows = len(row_end_offsets)
    groups = r_win // BLOCK
    rowe_p = np.concatenate([
        np.asarray(row_end_offsets, dtype=np.int64),
        np.full(r_win + BLOCK, num_nonzeros, np.int64)])
    lists = np.full((num_tiles, groups, k_cap), -1, np.int32)
    maxk = 0
    for t in range(num_tiles):
        nnz0, nnz1 = int(tile_nnz[t]), int(tile_nnz[t + 1])
        row0, row1 = int(tile_rows[t]), int(tile_rows[t + 1])
        arow0 = (row0 // BLOCK) * BLOCK
        sh_n = nnz0 - (nnz0 // BLOCK) * BLOCK
        sh_r = row0 - arow0
        nloc = nnz1 - nnz0
        w = rowe_p[arow0:arow0 + r_win]
        ends_rel = np.clip(w - nnz0, 0, nloc) + sh_n
        pj = np.clip(ends_rel - 1, 0, TE - 1)
        cb = (pj >> 10).astype(np.int32)
        # only rows [sh_r - 1, rows_end) matter (first-difference needs
        # one predecessor); others' chunks need not be visited
        rows_end = sh_r + (row1 - row0)
        ridx = np.arange(r_win)
        cb[(ridx < max(sh_r - 1, 0)) | (ridx >= rows_end)] = -1
        cb2 = cb.reshape(groups, BLOCK).copy()
        cb2.sort(axis=1)
        first = np.ones_like(cb2, dtype=bool)
        first[:, 1:] = cb2[:, 1:] != cb2[:, :-1]
        first &= cb2 >= 0
        cnt = first.sum(axis=1)
        k_t = int(cnt.max()) if len(cnt) else 0
        if k_t > k_cap:
            return None, 0
        maxk = max(maxk, k_t)
        rows_i, colpos = np.nonzero(first)
        dest = (np.cumsum(first.ravel()).reshape(first.shape) - 1
                - np.concatenate([[0], np.cumsum(cnt)[:-1]])[:, None])
        lists[t][rows_i, dest[first]] = cb2[first]
    k = max(1, maxk)
    if k_force:
        # caller needs a unified width across several constructions
        # (e.g. per-shard lists under one SPMD plan)
        if k_force > k_cap:
            raise ValueError("k_force exceeds k_cap")
        if maxk > k_force:
            return None, 0
        k = k_force
    lists = lists[:, :, :k]
    wr = -(-(groups * k) // 1024) * 1024
    packed = np.full((num_tiles, wr), -1, np.int32)
    packed[:, :groups * k] = lists.reshape(num_tiles, groups * k)
    return packed.ravel(), k


def row_window_np(row_end_offsets, num_nonzeros: int, tile_items: int) -> int:
    """Static row-window size R: max over tiles of (row1 - align1024(row0)),
    rounded up to 1024.  Bounds the per-tile y/row-offsets DMA windows so
    they scale with actual rows per tile instead of tile_items."""
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np

    tile_rows, _ = merge_tile_coordinates_np(
        row_end_offsets, num_nonzeros, tile_items)
    if len(tile_rows) < 2:
        return BLOCK
    row0 = tile_rows[:-1]
    row1 = tile_rows[1:]
    span = int((row1 - (row0 // BLOCK) * BLOCK).max())
    return max(BLOCK, -(-span // BLOCK) * BLOCK)


def row_span_np(row_end_offsets, num_nonzeros: int, tile_items: int) -> int:
    """Max 1024-entry cumsum blocks any 1024-row register's end positions
    can span — the static trip count for the row-phase gather unroll.
    Conservative: max items consumed by any 1024 consecutive rows."""
    rowe = np.asarray(row_end_offsets, dtype=np.int64)
    bpt = (tile_items + BLOCK) // BLOCK
    if len(rowe) <= BLOCK:
        span = int(rowe[-1]) if len(rowe) else 0
    else:
        span = int((rowe[BLOCK:] - rowe[:-BLOCK]).max())
    return int(min(span // BLOCK + 2, bpt))
