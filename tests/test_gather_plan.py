"""Gather-plan metadata invariants (ops/gather_plan.py).

The kernel's correctness depends on: every (block, subchunk) pair with at
least one nonzero appears in the block's list exactly once; counts never
overrun the list; the packed per-tile layout indexes blocks by the same
alignment rule the kernel uses.
"""

import numpy as np
import pytest

from merge_spmv_tpu.ops.gather_plan import (BLOCK, gather_meta_np,
                                            gather_meta_range, meta_width,
                                            pack_tile_meta_np, row_window_np)
from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np


def _check_lists(cols, nnz, cnt, lst):
    nb = -(-nnz // BLOCK)
    for b in range(nb):
        blk = cols[b * BLOCK:min((b + 1) * BLOCK, nnz)]
        want = np.unique(blk >> 7)
        got = lst[b, :cnt[b]]
        np.testing.assert_array_equal(np.sort(got), want)
        assert len(np.unique(got)) == cnt[b], "duplicate window would double-count"


@pytest.mark.parametrize("seed,ncols", [(0, 300), (1, 5000), (2, 200000)])
def test_distinct_lists_match_unique(seed, ncols):
    rs = np.random.RandomState(seed)
    nnz = 5000
    cols = rs.randint(0, ncols, nnz).astype(np.int32)
    meta = gather_meta_np(cols, nnz)
    assert meta is not None
    _check_lists(cols, nnz, *meta)


def test_banded_lists_are_small():
    nnz = 64 * 1024
    base = np.arange(nnz) // 8
    cols = (base + np.tile(np.arange(8), nnz // 8)).astype(np.int32)
    cnt, lst = gather_meta_np(cols, nnz)
    assert lst.shape[1] <= 3   # 1024 consecutive-ish cols span <= 2 windows
    _check_lists(cols, nnz, cnt, lst)


def test_k_cap_returns_none():
    rs = np.random.RandomState(3)
    cols = rs.randint(0, 1 << 20, 4096).astype(np.int32)
    assert gather_meta_np(cols, 4096, k_cap=4) is None


def test_padding_blocks_are_empty():
    cols = np.arange(100, dtype=np.int32)
    cnt, lst = gather_meta_np(cols, 100, pad_blocks=3)
    assert cnt.shape[0] == 4 and (cnt[1:] == 0).all()


def test_range_mode_covers_lists():
    import jax.numpy as jnp
    rs = np.random.RandomState(4)
    nnz = 3000
    cols = rs.randint(0, 2000, nnz).astype(np.int32)
    nb = -(-nnz // BLOCK)
    pad = nb * BLOCK - nnz
    cols_p = np.concatenate([cols, np.full(pad, cols[-1], np.int32)])
    cnt_r, lo_r = map(np.asarray,
                      gather_meta_range(jnp.asarray(cols_p), nnz, nb, shift=7))
    cnt_l, lst_l = gather_meta_np(cols, nnz)
    for b in range(nb):
        lo, hi = lo_r[b, 0], lo_r[b, 0] + cnt_r[b] - 1
        assert lo <= lst_l[b, 0] and hi >= lst_l[b, cnt_l[b] - 1]


def test_pack_tile_meta_layout():
    rs = np.random.RandomState(5)
    nnz, T = 10_000, 4096
    cols = rs.randint(0, 3000, nnz).astype(np.int32)
    rowe = np.sort(rs.randint(0, nnz, 99)).astype(np.int32)
    rowe = np.concatenate([rowe, [nnz]])
    bpt = (T + BLOCK) // BLOCK
    cnt, lst = gather_meta_np(cols, nnz, pad_blocks=bpt + 1)
    k = lst.shape[1]
    _, tile_nnz = merge_tile_coordinates_np(rowe, nnz, T)
    meta = pack_tile_meta_np(cnt, lst, tile_nnz, T)
    w = meta_width(T, k)
    assert meta.shape[0] == (len(tile_nnz) - 1) * w
    # spot-check: tile t, register r -> block (tile_nnz[t]//1024)+r
    for t in range(len(tile_nnz) - 1):
        b0 = tile_nnz[t] // BLOCK
        for r in range(bpt):
            b = min(b0 + r, len(cnt) - 1)
            assert meta[t * w + r] == cnt[b]
            np.testing.assert_array_equal(
                meta[t * w + bpt + r * k:t * w + bpt + (r + 1) * k], lst[b])


def test_row_window_covers_every_tile():
    rs = np.random.RandomState(6)
    for trial in range(5):
        n = rs.randint(10, 5000)
        nnz = rs.randint(1, 20000)
        rowe = np.sort(rs.randint(0, nnz + 1, n - 1)).astype(np.int64)
        rowe = np.concatenate([rowe, [nnz]])
        T = 1024 * rs.randint(1, 5)
        r_win = row_window_np(rowe, nnz, T)
        tr, _ = merge_tile_coordinates_np(rowe, nnz, T)
        span = tr[1:] - (tr[:-1] // BLOCK) * BLOCK
        assert r_win >= span.max()
        assert r_win % BLOCK == 0


def test_cluster_cover_exact_and_clamped():
    """cluster_meta_np: every distinct window is covered exactly once as
    base+rel, bases stay within [0, num_sub-8], rels within [0, 8)."""
    from merge_spmv_tpu.ops.gather_plan import cluster_meta_np, gather_meta_np

    rs = np.random.RandomState(4)
    n = 30000
    ncols = 5000
    cols = np.clip(np.arange(n) % ncols + rs.randint(-400, 400, n),
                   0, ncols - 1)
    num_sub = 8 * -(-ncols // 1024)
    bases, rels, widths, spans = cluster_meta_np(cols, n, num_sub)
    assert bases.max() <= num_sub - 8
    assert len(widths) == bases.shape[1]
    _, lst = gather_meta_np(cols, n)
    for b in range(lst.shape[0]):
        want = set(lst[b][lst[b] >= 0].tolist())
        got = []
        for c in range(bases.shape[1]):
            for w in range(widths[c]):
                r = rels[b, c, w]
                if r >= 0:
                    assert 0 <= r < 8
                    assert bases[b, c] >= 0
                    got.append(int(bases[b, c] + r))
        assert sorted(got) == sorted(want)


def test_cluster_pack_layout():
    """pack_tile_cmeta_np: block r's record sits at r*recw and matches the
    per-slot [base, rels...] concatenation."""
    from merge_spmv_tpu.ops.gather_plan import (cluster_meta_np, cmeta_width,
                                                pack_tile_cmeta_np)

    rs = np.random.RandomState(5)
    n = 6000
    cols = rs.randint(0, 900, n)
    bases, rels, widths, spans = cluster_meta_np(cols, n, 8)
    tile_nnz = [0, 2048, 4096, n]
    T = 2048
    packed = pack_tile_cmeta_np(bases, rels, widths, tile_nnz, T)
    wdt = cmeta_width(T, widths)
    recw = len(widths) + sum(widths)
    assert packed.shape[0] == (len(tile_nnz) - 1) * wdt
    for t in range(len(tile_nnz) - 1):
        b0 = tile_nnz[t] // 1024
        rec = packed[t * wdt:(t + 1) * wdt][:recw]
        want = []
        for c in range(len(widths)):
            want.append(bases[b0, c])
            want.extend(rels[b0, c, :widths[c]].tolist())
        assert rec.tolist() == want
