"""Two-phase plan contract and tuning-policy selection.

The reference exposes a query/allocate/run lifecycle (DeviceSpmv::CsrMV with
``d_temp_storage == NULL`` returns the scratch size; see SURVEY.md §3.3) and
selects per-SM tuning policies at compile time
(dispatch_spmv_orig.cuh:262-445).  The TPU-native equivalents:

* scratch planning is the XLA compiler's job — the plan instead pins the
  *shape-static* facts (tile size, tile count, backend choice) so repeat
  calls hit the jit cache (the analog of the reference's caching allocator
  making repeat dispatches cheap, util_allocator.cuh:101);
* the policy ladder keys on dtype + VMEM budget + matrix shape instead of SM
  architecture: TILE_ITEMS is the single knob (merge items per Pallas grid
  step), chosen so the fixed per-tile footprint (values, columns, row-ends,
  products) plus a resident x fits the ~16 MB/core VMEM.

Plans are hashable and comparable, suitable as static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from merge_spmv_tpu.ops.merge_path import num_merge_tiles

__all__ = ["SpmvPlan", "make_plan", "VMEM_BYTES_PER_CORE"]

# Usable VMEM per TensorCore (128 KiB reserved for the compiler).
VMEM_BYTES_PER_CORE = 16 * 1024 * 1024

# Default merge items per tile, keyed by value dtype (the policy ladder).
# Larger tiles amortize per-step overhead; smaller tiles cut the VMEM
# footprint and the padding waste on small matrices.
_DEFAULT_TILE_ITEMS = {
    "float32": 65536,
    "bfloat16": 65536,
    "float64": 65536,   # double-single route: three fp32 kernel passes
}

# Static-unroll caps for gather-window lists (instruction-count budget):
# fine 128-column windows (1 lane gather each) vs coarse 1024-column chunks
# (8-step compose each).  Blocks above both fall back to a dynamic range
# walk over 1024-column chunks.
_K_CAP_FINE = 16
_K_CAP_COARSE = 12

# Dynamic distinct-chunk lists ("dlist"): when both static caps fail, the
# per-block DISTINCT 1024-col chunk ids ride in SMEM and the kernel walks
# cnt of them — visits scale with what the block actually touches instead
# of the [lo, hi] RANGE the fallback walks (one stray global column made
# the range span the whole table: webbase-class ran 977 visits/block for
# ~170 distinct chunks, VERDICT r4 weak #4).
_K_CAP_DLIST = 255
_SMEM_META_INTS = 8192   # per-tile packed-meta budget (32 KiB int32)


def _dtype_name(dtype) -> str:
    return np.dtype(dtype).name if not hasattr(dtype, "name") else dtype.name


@dataclasses.dataclass(frozen=True)
class SpmvPlan:
    """Shape-static execution plan for CsrMV / CsrMM.

    Frozen + hashable: pass as a static argument to jitted entry points.
    """
    num_rows: int
    num_cols: int
    num_nonzeros: int
    dtype: str                 # value dtype name ("float32", ...)
    tile_items: int            # merge items per Pallas grid step
    num_tiles: int             # ceil((rows + nnz) / tile_items)
    backend: str               # "pallas" | "xla"
    x_in_vmem: bool            # whole x resident in VMEM (gather locality)
    num_rhs: int = 1           # k for SpMM (1 = SpMV)
    r_win: int = 0             # per-tile row window (multiple of 1024)
    meta_k: int = 0            # gather-list width (0 = range fallback)
    row_span: int = 0          # max cumsum blocks per row register (0 = BPT)
    meta_gran: int = 128       # gather window granularity (128 | 1024 cols)
    y_in_vmem: bool = False    # whole y VMEM-resident (one final write DMA)
    x_win: int = 0             # x-window subchunks when streaming (0 = x resident)
    runtime_skip: bool = False  # branchy kernel: skip inactive chunks/groups
                                # (skewed shapes only; branches cost on uniform)
    skip_cb: int = 8           # skip mode: 1024-nnz blocks per products branch
    skip_gq: int = 4           # skip mode: 1024-row groups per row-phase branch
    row_meta_k: int = 0        # distinct-chunk row-phase lists width
                               # (0 = range walk; see gather_plan.row_meta_np)
    gather_group: int = 1      # blocks per gather-group visit (>1: union
                               # window lists shared by G consecutive
                               # blocks amortize the dynamic fetch; then
                               # meta_k holds the union width K_G)
    rowends_vmem: bool = False  # whole row-end table VMEM-resident (staged
                                # once at t==0 like x): drops the per-step
                                # row-end DMA — only values+columns stream
    cluster_widths: tuple = ()  # cluster-gather mode (non-empty enables):
                                # per cluster slot, the packed-record rel
                                # width (gather_plan.cluster_meta_np)
    cluster_spans: tuple = ()   # per cluster slot, the static serve span:
                                # the kernel fetches 8 consecutive window
                                # rows once per slot and serves offsets
                                # 0..span-1 with STATIC sublane slices
                                # (no per-visit fetch or roll)
    gather_style: str = "chain"  # visit accumulation: "chain" (overwrite
                                 # select chain), "tree" (masked-add
                                 # pairwise tree: +1 op/visit but breaks
                                 # the serial dependence), "stage" (fetch
                                 # every visit row into dense scratch
                                 # first, then serve with static slices)
    ds: bool = False           # fused double-single fp64: values and x
                               # carry (hi, lo) fp32 pairs through ONE
                               # kernel pass (p = vh*xh + vh*xl + vl*xh)
                               # instead of three full passes — cols /
                               # row-ends / metadata stream once
    dlist: bool = False        # dynamic distinct-chunk gather lists:
                               # meta_k holds the per-block id budget and
                               # the kernel walks cnt ids from SMEM (the
                               # popularity/scatter class where the range
                               # walk spans the whole table)

    @property
    def num_merge_items(self) -> int:
        return self.num_rows + self.num_nonzeros

    def flops(self) -> int:
        """2*nnz*k multiply-adds (cpu_spmv.cpp:511 convention)."""
        return 2 * self.num_nonzeros * self.num_rhs

    def bytes_accessed(self) -> int:
        """The reference roofline byte model (cpu_spmv.cpp:508-509):
        per nonzero one value + one column index + one gathered x element;
        per row one offset + one y write.  RHS-scaled for SpMM."""
        vs = np.dtype(self.dtype).itemsize
        os_ = 4  # OffsetT = int32
        return (self.num_nonzeros * (vs * (1 + self.num_rhs) + os_)
                + self.num_rows * (os_ + vs * self.num_rhs))

    def describe(self) -> str:
        if self.cluster_widths:
            gm = f"cluster{self.cluster_spans or self.cluster_widths}"
        elif self.gather_group > 1:
            gm = f"group{self.gather_group}"
        elif self.meta_k and self.dlist:
            gm = f"dlist{self.meta_k}@{self.meta_gran}"
        elif self.meta_k:
            gm = f"list{self.meta_k}@{self.meta_gran}"
        else:
            gm = "range"
        return (f"SpmvPlan({self.num_rows}x{self.num_cols}, nnz="
                f"{self.num_nonzeros}, {self.dtype}, backend={self.backend}, "
                f"tile_items={self.tile_items}, tiles={self.num_tiles}, "
                f"x_in_vmem={self.x_in_vmem}, gather={gm}, "
                f"k={self.num_rhs})")


def make_plan(num_rows: int, num_cols: int, num_nonzeros: int,
              dtype="float32", tile_items: Optional[int] = None,
              backend: str = "auto", num_rhs: int = 1,
              vmem_bytes: int = VMEM_BYTES_PER_CORE,
              r_win: Optional[int] = None,
              meta_k: Optional[int] = None,
              x_win: Optional[int] = None,
              row_span: Optional[int] = None,
              row_end_offsets=None, col_indices=None,
              allow_x_streaming: bool = True,
              runtime_skip: Optional[bool] = None,
              gather_group: int = 1,
              gather_cluster=None,
              gather_style: str = "tree",
              gather_dlist=None,
              scratch: Optional[dict] = None) -> SpmvPlan:
    """Build an execution plan (phase 1 of the two-phase contract).

    backend="auto" picks the Pallas merge kernel when the platform supports
    it and x fits in VMEM, else the XLA segment-sum formulation.  The 1-wide
    degenerate case (num_cols == 1, dispatch_spmv_orig.cuh:566-593) routes
    to XLA; fp64 (not native on the TPU vector units) routes to
    "pallas_ds" — a double-single split running three fp32 merge kernels
    (products accurate to ~2^-48; fp32 accumulation, the same tolerance
    level the reference verifies fp64 at, utils.h:726-728).

    Passing the host CSR arrays (``row_end_offsets``, ``col_indices``)
    tightens the static kernel knobs: ``r_win`` (per-tile row window from
    the actual tile split) and ``meta_k`` (distinct gather windows per
    block; see ops/gather_plan.py).  Callers that precomputed those pass
    them directly — the device-side split builder (ops/split.py)
    computes ``r_win`` / ``x_win`` / ``row_span`` with on-device
    reductions and passes the scalars here, paying no host pass over the
    nonzeros.  build_operator (ops/operator.py) does all of this and
    uploads the gather lists once per matrix.

    ``scratch``, when given a dict, receives the metadata arrays the probe
    had to construct anyway (gather lists, row-phase lists) so the
    operator build does not pay the host passes twice — at circuit5M
    scale each pass sorts a ~57M-element array.
    """
    dname = _dtype_name(np.dtype(dtype))
    vs = np.dtype(dname).itemsize

    # x residency: whole x (all RHS columns) must fit alongside the tile
    # working set.  Budget x at half of VMEM.
    x_bytes = num_cols * vs * num_rhs
    x_in_vmem = x_bytes <= vmem_bytes // 2
    # y residency: keeping the whole output in VMEM removes the per-tile
    # write DMA + rolling-window shift (one final write instead)
    y_in_vmem = x_bytes + num_rows * 4 <= (vmem_bytes * 5) // 8

    if tile_items is None:
        tile_items = _DEFAULT_TILE_ITEMS.get(dname, 8192)
        # Round-2 sweep: 131072 beats 65536 by ~8 % on the restructured
        # kernel when the x+y working set leaves VMEM headroom for the
        # doubled tile scratch (tools/perf_probe.py sweep).
        if dname in ("float32", "bfloat16") and y_in_vmem:
            tile_items = 131072
        # Shrink tiles if the matrix is small: no point in one giant tile.
        total = num_rows + num_nonzeros
        while tile_items > 1024 and tile_items >= 4 * total:
            tile_items //= 2
    tile_items = max(1024, -(-int(tile_items) // 1024) * 1024)

    resolved = backend
    if backend == "auto":
        import jax
        platform = jax.default_backend()
        pallas_ok = (
            platform == "tpu"
            and dname in ("float32", "bfloat16", "float64")
            and num_cols > 1
            and num_nonzeros > 0
        )
        if pallas_ok:
            try:
                from merge_spmv_tpu.ops import csrmv_pallas  # noqa: F401
            except ImportError:
                pallas_ok = False
        if not pallas_ok:
            resolved = "xla"
        elif dname == "float64":
            resolved = "pallas_ds"
        else:
            resolved = "pallas"

    if r_win is None:
        if row_end_offsets is not None:
            from merge_spmv_tpu.ops.gather_plan import row_window_np
            r_win = row_window_np(row_end_offsets, num_nonzeros, tile_items)
        else:
            # safe bound: a tile completes at most tile_items rows, plus
            # up to 1023 alignment shift
            cap = -(-(int(num_rows) + 1) // 1024) * 1024 + 1024
            r_win = min(tile_items + 2048, cap)
    r_win = max(1024, -(-int(r_win) // 1024) * 1024)

    if row_span is None and row_end_offsets is not None:
        from merge_spmv_tpu.ops.gather_plan import row_span_np
        row_span = row_span_np(row_end_offsets, num_nonzeros, tile_items)
    if row_end_offsets is not None:
        from merge_spmv_tpu.ops.gather_plan import row_meta_np
        # row-phase distinct-chunk lists (the skew fix): the probe has to
        # build the full packed array to learn the width — hand it to the
        # caller via scratch so prepare_csrmv doesn't rebuild it
        _rm_packed, row_meta_k = row_meta_np(row_end_offsets, num_nonzeros,
                                             tile_items, r_win)
        if scratch is not None:
            scratch["rowmeta"] = (_rm_packed, row_meta_k)
    else:
        row_meta_k = 0
    row_span = 0 if row_span is None else int(row_span)

    meta_gran = 128
    dlist = False
    if gather_dlist is True and col_indices is not None and num_nonzeros:
        # dlist re-entry (see the auto-enable below): per-block distinct
        # 1024-col chunk ids become the (dynamic-length) gather lists
        from merge_spmv_tpu.ops.gather_plan import gather_meta_np
        dm = (scratch or {}).get("gmeta")
        if dm is None:
            dm = gather_meta_np(col_indices, num_nonzeros,
                                k_cap=_K_CAP_DLIST, shift=10)
        if dm is not None:
            meta_gran = 1024
            meta_k = dm[1].shape[1]
            dlist = True
            gather_group = 1
            gather_cluster = False
            if scratch is not None:
                scratch["gmeta"] = dm
                scratch["gmeta_group"] = 1
                scratch["gmeta_gran"] = 1024
    given_x_win = x_win
    x_win = 0
    # the fused double-single fp64 kernel streams (hi, lo) pairs: x
    # windows/tables and values windows cost 2x their fp32 footprint
    dsf = 2 if dname == "float64" else 1
    if not x_in_vmem:
        # x-window streaming (round 2): per-tile column windows of x are
        # DMA'd alongside the other inputs.  The round-1 v5e crash was
        # root-caused to an out-of-bounds window DMA (cbase unclamped past
        # the packed x table) plus an unwired staging buffer; both fixed,
        # verified compiled-on-chip (tests/test_csrmv_pallas.py).
        if allow_x_streaming and given_x_win:
            # caller computed the window on device (ops/split.py builder):
            # trust it, subject to the same VMEM budget
            num_sub = 8 * max(1, -(-int(num_cols) // 1024))
            cand = min(int(given_x_win), num_sub)
            if dsf * 2 * cand * 128 * 4 <= vmem_bytes // 3:
                x_win = cand
        elif (allow_x_streaming and col_indices is not None
                and row_end_offsets is not None):
            # x-window streaming: per-tile column windows DMA'd like the
            # other inputs (viable for column-local matrices only)
            from merge_spmv_tpu.ops.gather_plan import tile_col_meta_np
            _, x_win_sub = tile_col_meta_np(col_indices, num_nonzeros,
                                            row_end_offsets, tile_items)
            # +8 subchunks of slack: the device-side (coarse) window-base
            # fallback may start up to 7 subchunks below the fine base.
            # Capped at the packed x table height (num_sub) so the 2D
            # window DMA can never slice past the table.
            num_sub = 8 * max(1, -(-int(num_cols) // 1024))
            cand = min(x_win_sub + 8, num_sub)
            if dsf * 2 * cand * 128 * 4 <= vmem_bytes // 3:
                x_win = cand
        if x_win == 0 and resolved in ("pallas", "pallas_ds"):
            resolved = "xla"   # x neither resident nor windowable

    # Runtime skipping (branchy kernel): worth it only when the static
    # shapes are much larger than the mean per-tile work — i.e. skewed
    # row lengths force r_win (max rows/tile) or the item window far past
    # the average.  On uniform shapes the branch boundaries measurably
    # serialize the pipeline (≈2x on grid3d100), so keep them off there.
    num_tiles = num_merge_tiles(num_rows, num_nonzeros, tile_items)
    mean_rows = num_rows / max(num_tiles, 1)
    mean_items = num_nonzeros / max(num_tiles, 1)
    rs_auto = (mean_rows < 0.5 * r_win
               or mean_items < 0.5 * tile_items)
    # explicit override (autotune sweeps this knob; the 0.5 thresholds
    # above decided a measured 2x swing in round 2)
    runtime_skip = rs_auto if runtime_skip is None else bool(runtime_skip)
    if runtime_skip:
        gather_group = 1   # the skip path branches at per-block chunks

    if meta_k is None:
        if col_indices is not None:
            from merge_spmv_tpu.ops.gather_plan import (gather_meta_group_np,
                                                        gather_meta_np)
            meta = None
            if gather_group > 1:
                # grouped union lists: G consecutive blocks share one
                # visit list, amortizing the dynamic fetch + broadcast
                # (the dominant per-visit cost); cap scales with G since
                # the union grows by the window slide per extra block
                meta = gather_meta_group_np(
                    col_indices, num_nonzeros, gather_group,
                    k_cap=_K_CAP_FINE + 2 * gather_group, shift=7)
                if meta is None:
                    gather_group = 1
            if meta is None:
                meta = gather_meta_np(col_indices, num_nonzeros,
                                      k_cap=_K_CAP_FINE, shift=7)
            if meta is None:
                meta_gran = 1024
                meta = gather_meta_np(col_indices, num_nonzeros,
                                      k_cap=_K_CAP_COARSE, shift=10)
            if (meta is None and gather_dlist is None and x_in_vmem
                    and num_nonzeros):
                # dlist auto-enable: distinct ids fit the SMEM budget AND
                # the range walk the fallback would run is meaningfully
                # wider than the distinct count
                dm = gather_meta_np(col_indices, num_nonzeros,
                                    k_cap=_K_CAP_DLIST, shift=10)
                if dm is not None:
                    k_dyn = dm[1].shape[1]
                    nbk = -(-num_nonzeros // 1024)
                    sc = np.asarray(col_indices[:num_nonzeros],
                                    np.int64) >> 10
                    scp = np.pad(sc, (0, nbk * 1024 - num_nonzeros),
                                 mode="edge").reshape(nbk, 1024)
                    rng = (scp.max(axis=1) - scp.min(axis=1) + 1).mean()
                    if rng >= 1.5 * float(dm[0][:nbk].mean()):
                        bpt_fit = max(3, _SMEM_META_INTS // (1 + k_dyn) - 1)
                        t_fit = min(int(tile_items), (bpt_fit - 1) * 1024)
                        if scratch is not None:
                            scratch["gmeta"] = dm
                            scratch["gmeta_group"] = 1
                            scratch["gmeta_gran"] = 1024
                        return make_plan(
                            num_rows, num_cols, num_nonzeros, dtype=dname,
                            tile_items=t_fit, backend=backend,
                            num_rhs=num_rhs, vmem_bytes=vmem_bytes,
                            row_end_offsets=row_end_offsets,
                            col_indices=col_indices,
                            allow_x_streaming=allow_x_streaming,
                            runtime_skip=runtime_skip,
                            gather_style=gather_style, gather_dlist=True,
                            scratch=scratch)
            # (A round-5 experiment rerouted extreme global scatter
            # (range >= 384 chunks/block) to the XLA fallback on the
            # theory that its element gather beats ~50 ns/visit range
            # walks; measured on chip it was 3.5x WORSE — XLA's
            # searchsorted + scatter-add segment sum runs ~167 ns/nnz on
            # the kron-like class vs the range walk's 47.  The range
            # walk stays the scatter fallback.)
            meta_k = 0 if meta is None else meta[1].shape[1]
            if scratch is not None and meta is not None:
                scratch["gmeta"] = meta             # (cnt, lst) unpadded
                scratch["gmeta_group"] = int(gather_group)
                scratch["gmeta_gran"] = int(meta_gran)
        else:
            meta_k = 0
            meta_gran = 1024
    if meta_k == 0 or meta_gran != 128:
        gather_group = 1
    if dlist:
        meta_k = int(meta_k)   # the dlist budget set above survives

    # Cluster-gather mode (opt-in): one 8-row fetch per contiguous window
    # cluster serves its visits from registers via barrel rolls.  Viable
    # when x is VMEM-resident, the fine lists exist, and the cover is
    # tight (stencil/banded/FEM shapes); degrades to the plain list
    # otherwise.  Works under the runtime-skip path too (the clist
    # branch lives inside the shared per-block gather; its SMEM reads
    # are the same pattern the list mode already uses in branches) —
    # the skew pair must not regress relative to a cluster-fast uniform.
    cluster_widths: tuple = ()
    cluster_spans: tuple = ()
    # gather_cluster=None (the default) auto-enables the cluster mode when
    # a cover exists AND the static op-count model predicts a win over the
    # list mode (chip-measured grid3d100: cluster 0.515 vs list 0.536 ms).
    auto_cluster = gather_cluster is None
    if ((gather_cluster or auto_cluster) and x_in_vmem and meta_k
            and meta_gran == 128 and gather_group == 1
            and col_indices is not None):
        from merge_spmv_tpu.ops.gather_plan import cluster_meta_np
        num_sub_x = 8 * max(1, -(-int(num_cols) // 1024))
        cm = cluster_meta_np(col_indices, num_nonzeros, num_sub_x,
                             meta=(scratch or {}).get("gmeta"))
        if cm is not None and auto_cluster:
            # per-block cost model, recalibrated from VPU_CEILING.json
            # (round 5): the dynamic sublane fetch costs ~4.4 ns PER
            # SUBLANE (a span fetch is as expensive as span 1-row
            # fetches), and the serve (gather+cmp+sel) ~3 ns per window
            # — so both modes cost ~7.4 ns x (sublanes touched).  The
            # cluster mode only wins when its total span is decisively
            # below the list width (overlapping windows served once);
            # chip-measured on grid3d100 (spans (5,3,3), K=11): list+tree
            # 0.493 ms vs cluster 0.508 — equal span, no win.
            list_ops = 7.4 * meta_k
            clu_ops = sum(7.4 * sp for sp in cm[3])
            if clu_ops >= 0.9 * list_ops:
                cm = None
        if cm is not None:
            cluster_widths = cm[2]
            cluster_spans = cm[3]
            if scratch is not None:
                scratch["cmeta"] = cm

    # Resident row-ends (headline class): when x and y are both VMEM
    # resident, staging the padded row-end table once leaves values +
    # columns as the only per-step DMA streams.  Budgeted against the
    # full working set so the compiler keeps ~1.5 MB of headroom.
    out_len = -(-(int(num_rows) + r_win + 1024) // 1024) * 1024
    rowends_vmem = False
    if (resolved in ("pallas", "pallas_ds") and x_in_vmem and y_in_vmem
            and not x_win):
        num_sub = 8 * max(1, -(-int(num_cols) // 1024))
        working = (dsf * num_sub * 128 * 4    # x table (hi+lo when ds)
                   + out_len * 4              # y window
                   + out_len * 4              # row-end table
                   + (1 + dsf) * (tile_items + 1024) * 8  # values+cols wins
                   + ((tile_items + 1024) // 1024) * 4096 * 2  # cs + pref
                   + 2 * r_win * 4)           # row stage scratch
        rowends_vmem = working <= (vmem_bytes * 29) // 32

    return SpmvPlan(
        num_rows=int(num_rows),
        num_cols=int(num_cols),
        num_nonzeros=int(num_nonzeros),
        dtype=dname,
        tile_items=int(tile_items),
        num_tiles=num_tiles,
        backend=resolved,
        x_in_vmem=bool(x_in_vmem),
        num_rhs=int(num_rhs),
        r_win=int(r_win),
        meta_k=int(meta_k),
        row_span=int(row_span),
        meta_gran=int(meta_gran),
        y_in_vmem=bool(y_in_vmem),
        x_win=int(x_win),
        runtime_skip=bool(runtime_skip),
        row_meta_k=int(row_meta_k),
        gather_group=int(gather_group),
        rowends_vmem=bool(rowends_vmem),
        cluster_widths=tuple(cluster_widths),
        cluster_spans=tuple(cluster_spans),
        gather_style=str(gather_style),
        dlist=bool(dlist),
    )
