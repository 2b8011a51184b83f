"""Merge-path CsrMV as a single Pallas TPU kernel.

TPU re-design of the reference three-kernel GPU pipeline
(DeviceSpmvSearchKernel / DeviceSpmvKernel / DeviceSegmentFixupKernel,
cub/device/dispatch/dispatch_spmv_orig.cuh:104-224):

* **Search** collapses to one vectorized `searchsorted` in the jitted
  prologue (ops/merge_path.py) whose per-tile coordinates are fed to the
  kernel as scalar-prefetch arrays — the TPU analog of the separate search
  kernel decision at dispatch_spmv_orig.cuh:674-699.
* **Tile consumption**: each grid step owns TILE_ITEMS merge items.  The
  fixed VMEM footprint per tile (values, columns, row-ends windows) is the
  reference's central guarantee (agent_spmv_orig.cuh:219-241), enforced here
  by static DMA window sizes.  Instead of a per-thread sequential merge loop
  + BlockScan (agent_spmv_orig.cuh:557-590), the in-tile reduction is
  expressed in VPU-friendly form: an inclusive roll-tree cumulative sum over
  the tile's products, then per-row difference of the cumsum at row
  boundaries — gathered with a register-level chunk-scan gather (see below).
* **Fix-up** (agent_segment_fixup.cuh) disappears: Pallas grid steps run
  sequentially on a TensorCore, so the partial sum of the row spanning a
  tile boundary is carried in SMEM scratch and folded into the tile that
  completes the row.  Completed rows form a contiguous window per tile, so
  y updates are dense window writes — no scatter, no atomics, no decoupled
  look-back.  (A carry-pair + segment-sum variant is kept for future
  multi-core grids; see parallel/ for the cross-chip equivalent.)

The performance crux (SURVEY.md §7.3) is the random gather ``x[col]``: this
TPU stack exposes only register-local dynamic gathers (8×128 lane gather,
8-sublane gather).  The kernel therefore keeps x fully VMEM-resident, laid
out as (n_chunks, 8, 128) chunks of 1024 columns, and gathers with a
**chunk-scan**: for every 8×128 block of nonzeros it visits only the chunk
range [min(col)>>10, max(col)>>10] and composes sublane+lane register
gathers per chunk.  Matrices with column locality (banded FEM / grid
stencils — after any bandwidth-reducing ordering) touch O(1) chunks per
block and run at HBM speed; fully random columns degrade linearly in
num_cols but remain far faster than XLA's scalar gather.  num_cols beyond
the VMEM budget routes to the XLA fallback (ops/plan.py policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates
from merge_spmv_tpu.ops.plan import SpmvPlan

__all__ = ["csrmv_pallas", "csrmm_pallas"]

LANES = 128
SUBLANES = 8
CHUNK = SUBLANES * LANES  # 1024 columns per x chunk


def _flat_iota(shape):
    """Flat element index over a (rows, 128) block (2D iota, TPU-safe)."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return r * shape[1] + c


def _cumsum_lanes(x):
    """Inclusive cumsum along the lane axis of an (R, 128) block via a
    log2(128) shift-add tree (Mosaic has no cumsum primitive)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < x.shape[1]:
        rolled = pltpu.roll(acc, shift, 1)
        acc = acc + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return acc


def _cumsum_sublanes(x):
    """Inclusive cumsum along the sublane axis of an (R, 128) block."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    acc = x
    shift = 1
    while shift < x.shape[0]:
        rolled = pltpu.roll(acc, shift, 0)
        acc = acc + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return acc


def _cumsum_tile(p):
    """Inclusive flat cumsum of a (TR, 128) tile (row-major order)."""
    within = _cumsum_lanes(p)                      # cumsum inside each row
    row_tot = within[:, -1:]                       # (TR, 1)
    # exclusive cumsum of row totals down the sublane axis
    row_off = _cumsum_sublanes(jnp.broadcast_to(row_tot, p.shape))
    row_off = row_off - jnp.broadcast_to(row_tot, p.shape)
    return within + row_off


def _gather_block(table_ref, idx, c_lo, c_hi):
    """Gather table[idx] for one (8, 128) block of int32 indices.

    table_ref: VMEM ref shaped (n_chunks, 8, 128), element e of chunk c at
    (c, (e>>7) & 7, e & 127).  Scans chunks [c_lo, c_hi] (dynamic scalar
    bounds); per chunk composes a lane gather and a sublane gather for each
    of the 8 output sublanes.  idx must be pre-clamped to table range.
    """
    out_shape = idx.shape  # (8, 128)

    def chunk_body(c, acc):
        chunk = table_ref[c]                         # (8, 128)
        rel = idx - c * CHUNK
        in_chunk = (rel >= 0) & (rel < CHUNK)
        rel = jnp.clip(rel, 0, CHUNK - 1)
        s = rel >> 7          # sublane of target
        l = rel & (LANES - 1)  # lane of target
        got = acc
        for i in range(SUBLANES):
            # Broadcast output-row i's indices to all 8 sublanes, then
            # lane-gather + sublane-gather (both register-local, supported).
            l_i = jnp.broadcast_to(l[i:i + 1, :], out_shape)
            s_i = jnp.broadcast_to(s[i:i + 1, :], out_shape)
            t1 = jnp.take_along_axis(chunk, l_i, axis=1)   # t1[r,j]=chunk[r,l_i[j]]
            t2 = jnp.take_along_axis(t1, s_i, axis=0)      # t2[r,j]=chunk[s_i[j],l_i[j]]
            row_mask = jax.lax.broadcasted_iota(jnp.int32, out_shape, 0) == i
            got = jnp.where(row_mask & in_chunk, t2, got)
        return got

    init = jnp.zeros(out_shape, dtype=table_ref.dtype)
    return jax.lax.fori_loop(c_lo, c_hi + 1, chunk_body, init)


def _gather_tile(table_ref, idx, valid_mask, n_chunks_static):
    """Gather table[idx] over a (TR, 128) tile of indices.

    Per 8-row block, visits only chunks [min(idx)>>10, max(idx)>>10] of the
    (n_chunks, 8, 128) table — O(1) chunks for column-local blocks.
    """
    tr = idx.shape[0]
    idx = jnp.where(valid_mask, idx, 0)
    parts = []
    for b in range(tr // SUBLANES):
        blk = idx[b * SUBLANES:(b + 1) * SUBLANES]
        mblk = valid_mask[b * SUBLANES:(b + 1) * SUBLANES]
        blk_for_min = jnp.where(mblk, blk, n_chunks_static * CHUNK)
        blk_for_max = jnp.where(mblk, blk, 0)
        c_lo = jnp.clip(jnp.min(blk_for_min) // CHUNK, 0, n_chunks_static - 1)
        c_hi = jnp.clip(jnp.max(blk_for_max) // CHUNK, 0, n_chunks_static - 1)
        parts.append(_gather_block(table_ref, blk, c_lo, c_hi))
    return jnp.concatenate(parts, axis=0)


def _cs_at(cs_table_ref, k, valid_mask, tile_items):
    """Inclusive-cumsum lookup: cs_at(k) = cs[k-1], 0 for k <= 0.

    k: (TR, 128) int32 positions in [0, tile_items]; cs_table_ref: VMEM
    scratch holding the cumsum reshaped (TR//8, 8, 128).  Reuses the
    chunk-scan register gather with the cs scratch as the table.
    """
    pos = jnp.clip(k - 1, 0, tile_items - 1)
    gathered = _gather_tile(cs_table_ref, pos, valid_mask,
                            tile_items // CHUNK)
    return jnp.where(k > 0, gathered, 0.0)


def _scalar_pick(vec2d, k):
    """Pick flat element k (dynamic scalar) from a (TR, 128) block."""
    flat = _flat_iota(vec2d.shape)
    return jnp.sum(jnp.where(flat == k, vec2d, 0.0))


# ---------------------------------------------------------------------- #
# The kernel
# ---------------------------------------------------------------------- #

def _spmv_kernel(
    # scalar prefetch
    tile_rows_ref, tile_nnz_ref,
    # inputs
    x_ref,            # VMEM (n_chunks, 8, 128)
    vals_hbm, cols_hbm, rowends_hbm,
    _ybase_alias,     # input view of the aliased y buffer (unused; see y_hbm)
    # outputs (same buffer as _ybase_alias via input_output_aliases)
    y_hbm,
    # scratch
    vals_s, cols_s, rowends_s, y_s, cs_s, carry_s, sems,
    *, tile_items: int, num_rows: int, n_chunks: int,
):
    t = pl.program_id(0)
    te = tile_items + CHUNK          # extended (alignment-padded) tile
    tre = te // LANES

    nnz0 = tile_nnz_ref[t]
    nnz1 = tile_nnz_ref[t + 1]
    row0 = tile_rows_ref[t]
    row1 = tile_rows_ref[t + 1]
    nloc = nnz1 - nnz0
    rows_done = row1 - row0

    # DMA windows must start on a VMEM-tile boundary: align down to CHUNK
    # and carry the in-window shift (the merge coordinates stay exact).
    annz0 = pl.multiple_of((nnz0 // CHUNK) * CHUNK, CHUNK)
    arow0 = pl.multiple_of((row0 // CHUNK) * CHUNK, CHUNK)
    sh_n = nnz0 - annz0
    sh_r = row0 - arow0

    # --- stage tile windows into VMEM (fixed footprint) ----------------- #
    dma_v = pltpu.make_async_copy(vals_hbm.at[pl.ds(annz0, te)], vals_s,
                                  sems.at[0])
    dma_c = pltpu.make_async_copy(cols_hbm.at[pl.ds(annz0, te)], cols_s,
                                  sems.at[1])
    dma_r = pltpu.make_async_copy(rowends_hbm.at[pl.ds(arow0, te)], rowends_s,
                                  sems.at[2])
    dma_y = pltpu.make_async_copy(y_hbm.at[pl.ds(arow0, te)], y_s, sems.at[3])
    dma_v.start()
    dma_c.start()
    dma_r.start()
    dma_y.start()

    @pl.when(t == 0)
    def _():
        carry_s[0] = 0.0

    dma_v.wait()
    dma_c.wait()

    vals = vals_s[:].reshape(tre, LANES)
    cols = cols_s[:].reshape(tre, LANES)
    flat = _flat_iota((tre, LANES))
    item_mask = (flat >= sh_n) & (flat < sh_n + nloc)

    # --- products: p[j] = values[j] * x[col[j]] -------------------------- #
    xg = _gather_tile(x_ref, cols, item_mask, n_chunks)
    p = jnp.where(item_mask, vals * xg, 0.0)

    # --- inclusive cumsum over the tile's merge products ----------------- #
    cs = _cumsum_tile(p)
    total = _scalar_pick(cs, te - 1)
    cs_s[...] = cs.reshape(cs_s.shape)   # stage as gather table

    # --- per-row sums via cumsum differences at row boundaries ----------- #
    # Window row index rl covers global rows [arow0, arow0+te); the tile's
    # first (possibly carry-continued) row sits at rl == sh_r.
    dma_r.wait()
    rowends = rowends_s[:].reshape(tre, LANES)
    ends_rel = jnp.clip(rowends - nnz0, 0, nloc) + sh_n   # positions in window
    # starts = previous row's end (flat shift right by one item)
    prev = pltpu.roll(ends_rel, 1, 1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 1) == 0
    prev_row_last = pltpu.roll(ends_rel[:, -1:], 1, 0)    # wrap row -1
    starts_rel = jnp.where(first_col,
                           jnp.broadcast_to(prev_row_last, prev.shape), prev)
    starts_rel = jnp.where(flat == sh_r, sh_n, starts_rel)

    all_valid = jnp.full((tre, LANES), True)
    cs_end = _cs_at(cs_s, ends_rel, all_valid, te)
    cs_start = _cs_at(cs_s, starts_rel, all_valid, te)
    rowsum = cs_end - cs_start

    # --- carry in / carry out (replaces the fixup kernel) ---------------- #
    carry_in = carry_s[0]
    rowsum = rowsum + jnp.where(flat == sh_r, carry_in, 0.0)

    # items consumed by completed rows = ends_rel of the last completed row
    row_mask = (flat >= sh_r) & (flat < sh_r + rows_done)
    end_last = jnp.max(jnp.where(row_mask, ends_rel, sh_n))
    cs_at_last = jnp.where(end_last > 0,
                           _scalar_pick(cs, jnp.maximum(end_last - 1, 0)), 0.0)
    carry_out = jnp.where(rows_done > 0,
                          total - cs_at_last,
                          carry_in + total)
    carry_s[0] = carry_out

    # --- dense window write of completed rows ---------------------------- #
    # y is read-modify-written in place (aliased buffer, sequential grid):
    # rows outside [sh_r, sh_r+rows_done) keep whatever earlier tiles wrote.
    dma_y.wait()
    ybase = y_s[:].reshape(tre, LANES)
    write_mask = row_mask & ((flat - sh_r + row0) < num_rows)
    ynew = jnp.where(write_mask, ybase + rowsum, ybase)
    y_s[:] = ynew.reshape(y_s.shape)
    dma_w = pltpu.make_async_copy(y_s, y_hbm.at[pl.ds(arow0, te)], sems.at[3])
    dma_w.start()
    dma_w.wait()


def _pack_x(x, n_chunks):
    """Pad + reshape x to the (n_chunks, 8, 128) chunk layout."""
    pad = n_chunks * CHUNK - x.shape[0]
    xp = jnp.pad(x, (0, pad))
    return xp.reshape(n_chunks, SUBLANES, LANES)


@functools.partial(jax.jit, static_argnums=(0, 7))
def _csrmv_pallas_padded(plan: SpmvPlan, values_p, cols_p, rowends_p,
                         x, y_base_p, alpha, interpret):
    """Inner jitted body; inputs pre-padded by tile_items."""
    T = plan.tile_items
    num_tiles = plan.num_tiles
    n_chunks = max(1, -(-plan.num_cols // CHUNK))

    # Search phase: one fused searchsorted for all tile diagonals
    # (replaces DeviceSpmvSearchKernel, dispatch_spmv_orig.cuh:104-143).
    tile_rows, tile_nnz = merge_tile_coordinates(
        rowends_p[:plan.num_rows], plan.num_nonzeros, T)

    # alpha folds into x (p[j] = v[j] * (alpha*x)[col[j]]), keeping the
    # kernel scale-free; beta is folded into y_base by the caller.
    x_packed = _pack_x(alpha * x, n_chunks)

    TE = T + CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x chunks, resident
            pl.BlockSpec(memory_space=pltpu.ANY),    # values
            pl.BlockSpec(memory_space=pltpu.ANY),    # col indices
            pl.BlockSpec(memory_space=pltpu.ANY),    # row end offsets
            pl.BlockSpec(memory_space=pltpu.ANY),    # y base (beta*y_in)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((TE,), jnp.float32),
            pltpu.VMEM((TE,), jnp.int32),
            pltpu.VMEM((TE,), jnp.int32),
            pltpu.VMEM((TE,), jnp.float32),
            pltpu.VMEM((TE // CHUNK, SUBLANES, LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(
        _spmv_kernel, tile_items=T, num_rows=plan.num_rows, n_chunks=n_chunks)

    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(y_base_p.shape, jnp.float32),
        input_output_aliases={6: 0},   # y base buffer is updated in place
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # sequential: carry chain
        ),
        interpret=bool(interpret),
    )(tile_rows, tile_nnz, x_packed, values_p, cols_p, rowends_p, y_base_p)
    return y[:plan.num_rows]


def csrmv_pallas(plan: SpmvPlan, values, row_end_offsets, col_indices, x,
                 y_in=None, alpha=1.0, beta=0.0, interpret: bool = False):
    """y = alpha*A*x + beta*y_in via the merge-path Pallas kernel.

    Currently float32 (the TPU-native benchmark dtype; fp64 routes to the
    XLA backend per the plan policy).
    """
    T = plan.tile_items + CHUNK   # extended window (alignment slack)
    f32 = jnp.float32
    values_p = jnp.pad(values.astype(f32), (0, T))
    cols_p = jnp.pad(col_indices, (0, T))
    # pad row-ends with nnz (empty padding rows, consumed harmlessly)
    rowends_p = jnp.pad(row_end_offsets, (0, T),
                        constant_values=plan.num_nonzeros)
    x = x.astype(f32)
    if y_in is not None:
        y_base = beta * y_in.astype(f32)
    else:
        y_base = jnp.zeros((plan.num_rows,), f32)
    y_base_p = jnp.pad(y_base, (0, T))
    alpha = float(alpha) if not hasattr(alpha, "dtype") else alpha
    y = _csrmv_pallas_padded(plan, values_p, cols_p, rowends_p, x,
                             y_base_p, jnp.asarray(alpha, f32), bool(interpret))
    return y


def csrmm_pallas(plan, values, row_end_offsets, col_indices, X,
                 Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False):
    """SpMM via the merge kernel, one RHS column at a time (placeholder —
    a blocked MXU SpMM kernel lands next; see ops/csrmm design notes)."""
    cols = [csrmv_pallas(plan, values, row_end_offsets, col_indices,
                         X[:, k],
                         None if Y_in is None else Y_in[:, k],
                         alpha, beta, interpret)
            for k in range(X.shape[1])]
    return jnp.stack(cols, axis=1)
