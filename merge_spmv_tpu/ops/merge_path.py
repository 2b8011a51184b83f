"""The 2D merge-path decomposition.

CsrMV is recast as the merge of two sorted lists (Merrill & Garland SC'16):

* list A = row *end* offsets (``row_offsets[1:]``, length num_rows),
* list B = the natural numbers indexing the nonzeros (0..nnz-1, implicit).

The merge path has length ``num_rows + num_nonzeros``; splitting it at equal
diagonals yields equal-work shares regardless of row-length skew.  The split
coordinate on diagonal ``d`` is found by binary search (reference:
cpu_spmv.cpp:223-245, cub/thread/thread_search.cuh:53-84).

TPU-native twist: because list B is a counting sequence, the 2D binary search
collapses to a 1D ``searchsorted`` over the strictly increasing key
``row_end_offsets[r] + r``:

    consume-A condition  a[x] <= d - x - 1   ⇔   a[x] + x < d

so the split x is the first index with ``a[x] + x >= d``.  This turns the
reference's per-tile search kernel (dispatch_spmv_orig.cuh:104-143) into one
vectorized `jnp.searchsorted` over all tile diagonals — no custom kernel
needed, and it fuses into the jitted SpMV prologue.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "merge_path_search",
    "merge_path_search_np",
    "merge_tile_coordinates",
    "merge_tile_coordinates_np",
    "num_merge_tiles",
]


# ---------------------------------------------------------------------- #
# Host (NumPy)
# ---------------------------------------------------------------------- #

def merge_path_search_np(diagonals, row_end_offsets, num_nonzeros: int):
    """Split coordinates for one or many diagonals, on the host.

    Returns (x, y): x = rows consumed (index into list A), y = nonzeros
    consumed (index into list B), with x + y == diagonal.
    """
    a = np.asarray(row_end_offsets, dtype=np.int64)
    d = np.asarray(diagonals, dtype=np.int64)
    a_len = a.shape[0]
    key = a + np.arange(a_len, dtype=np.int64)  # strictly increasing
    x = np.searchsorted(key, d, side="left")
    # Clamp to the legal window [max(d - nnz, 0), min(d, a_len)]
    # (cpu_spmv.cpp:231-232); the searchsorted result already satisfies the
    # upper bound only when d <= a_len + max(key); clamp explicitly.
    x = np.minimum(np.maximum(x, np.maximum(d - num_nonzeros, 0)),
                   np.minimum(d, a_len))
    y = d - x
    return x.astype(np.int64), y.astype(np.int64)


def merge_path_search(diagonals, row_end_offsets, num_nonzeros: int):
    """Device (JAX) version: vectorized over `diagonals`.

    One fused searchsorted replaces DeviceSpmvSearchKernel
    (dispatch_spmv_orig.cuh:104-143).
    """
    import jax.numpy as jnp

    a = row_end_offsets.astype(jnp.int32)
    a_len = a.shape[0]
    d = jnp.asarray(diagonals, dtype=jnp.int32)
    key = a + jnp.arange(a_len, dtype=jnp.int32)
    x = jnp.searchsorted(key, d, side="left").astype(jnp.int32)
    x = jnp.clip(x, jnp.maximum(d - num_nonzeros, 0), jnp.minimum(d, a_len))
    y = d - x
    return x, y


# ---------------------------------------------------------------------- #
# Tile planning
# ---------------------------------------------------------------------- #

def num_merge_tiles(num_rows: int, num_nonzeros: int, tile_items: int) -> int:
    """ceil((rows + nnz) / TILE_ITEMS)  (dispatch_spmv_orig.cuh:608-616)."""
    total = num_rows + num_nonzeros
    return max(1, -(-total // tile_items))


def merge_tile_coordinates_np(row_end_offsets, num_nonzeros: int,
                              tile_items: int):
    """Host tile split: returns (tile_rows, tile_nnz), each [num_tiles + 1].

    Tile t owns merge items [t*tile_items, (t+1)*tile_items): rows
    [tile_rows[t], tile_rows[t+1]) complete inside it and nonzeros
    [tile_nnz[t], tile_nnz[t+1]).
    """
    a = np.asarray(row_end_offsets)
    n_tiles = num_merge_tiles(len(a), num_nonzeros, tile_items)
    diags = np.minimum(np.arange(n_tiles + 1, dtype=np.int64) * tile_items,
                       len(a) + num_nonzeros)
    x, y = merge_path_search_np(diags, a, num_nonzeros)
    return x.astype(np.int32), y.astype(np.int32)


def merge_tile_coordinates(row_end_offsets, num_nonzeros: int,
                           tile_items: int):
    """Device tile split (jit-traceable; static num_nonzeros/tile_items)."""
    import jax.numpy as jnp

    a_len = row_end_offsets.shape[0]
    n_tiles = num_merge_tiles(a_len, num_nonzeros, tile_items)
    diags = jnp.minimum(
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_items,
        a_len + num_nonzeros)
    return merge_path_search(diags, row_end_offsets, num_nonzeros)
