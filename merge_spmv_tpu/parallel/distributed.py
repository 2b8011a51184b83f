"""SPMD merge-path CsrMV over a device mesh (`jax.shard_map`).

Per-shard flow (each device owns one equal-merge-work share from
partition.py):

1. **x halo exchange** (halo mode): x lives sharded as [S, cpad] column
   blocks; two neighbor `ppermute`s move the `halo`-wide block edges so
   each shard holds [left_halo | own_block | right_halo] — the
   collectives ride the ICI neighbor links, nothing is replicated.
   Replicate mode (windows span the mesh) passes the full x through
   unchanged (v1 behavior, correct for any matrix).
2. **local SpMV** over the share's padded CSR window (the share may start
   and end mid-row — exactly like an OMP thread's share,
   cpu_spmv.cpp:324-344), column indices already window-local.
3. **carry reduce-scatter**: shard s's spanning-row partial is one scalar
   whose destination shard was precomputed at partition time (it is
   always the destination's FIRST local row — see partition.py).  One
   `psum_scatter` of S scalars delivers every shard the sum of foreign
   partials for its first row.  This is the SPMD realization of the
   reference's carry fix-up (serial loop cpu_spmv.cpp:347-353; fixup
   kernel agent_segment_fixup.cuh) with the look-back machinery replaced
   by a single collective.
4. output stays row-sharded as per-shard windows (exclusive after the
   exchange); `materialize_y` assembles the dense global vector.
"""

from __future__ import annotations

import numpy as np

from merge_spmv_tpu.parallel.partition import MergePartition

__all__ = ["distributed_csrmv", "distributed_csrmv_fn", "materialize_y",
           "prepare_distributed_csrmv", "PreparedDistributedCsrmv"]


def _local_csrmv_xla(values, cols, rowends_local, x, nnz_max):
    """Local segment-sum SpMV over one padded share (device code)."""
    import jax
    import jax.numpy as jnp

    j = jnp.arange(nnz_max, dtype=jnp.int32)
    row_ids = jnp.searchsorted(rowends_local, j, side="right").astype(jnp.int32)
    products = values * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(products, row_ids,
                               num_segments=rowends_local.shape[0])


def prepare_distributed_csrmv(part: MergePartition, dtype="float32",
                              tile_items=None):
    """Host-side per-shard kernel preparation for the SPMD path.

    The round-2 multi-chip path built each shard's plan WITHOUT the
    shard's row-end/column arrays (range-fallback gather, worst-case row
    windows) and re-padded per call.  This brings the single-chip
    prepare-once machinery to every shard: per-shard gather lists,
    row-phase distinct-chunk lists, fused tile coordinates and padded
    arrays, all stacked [S, ...] for shard_map, under ONE unified plan
    (SPMD needs identical static shapes; per-shard knobs are maxed).

    Returns (plan, arrays) with arrays a dict of numpy [S, ...] stacks;
    feed to distributed_csrmv_fn(..., prepared=(plan, arrays)).
    """
    import dataclasses

    from merge_spmv_tpu.ops import gather_plan as gp
    from merge_spmv_tpu.ops.merge_path import (merge_tile_coordinates_np,
                                               num_merge_tiles)
    from merge_spmv_tpu.ops.plan import make_plan

    S = part.num_shards
    R, NZ = part.rows_max, part.nnz_max
    C = part.local_x_width
    # backend pinned to pallas: off-TPU meshes run the kernel interpreted
    # (the same choice the unprepared pallas local_backend makes)
    plan0 = make_plan(R, C, NZ, dtype=dtype, tile_items=tile_items,
                      backend="pallas", allow_x_streaming=False)
    T = plan0.tile_items
    TE = T + gp.BLOCK
    num_tiles = num_merge_tiles(R, NZ, T)
    out_len = 0   # set below once r_win is known

    # --- per-shard knob probing -------------------------------------- #
    r_win = gp.BLOCK
    row_span = 0
    for s in range(S):
        r_win = max(r_win, gp.row_window_np(part.rowends_local[s], NZ, T))
        row_span = max(row_span,
                       gp.row_span_np(part.rowends_local[s], NZ, T))
    out_len = -(-(R + r_win + gp.BLOCK) // gp.BLOCK) * gp.BLOCK

    # gather lists: fine for all shards, else coarse for all, else range
    def probe_meta(shift, cap):
        out = []
        for s in range(S):
            m = gp.gather_meta_np(part.col_indices[s], NZ,
                                  pad_blocks=TE // gp.BLOCK + 1,
                                  k_cap=cap, shift=shift)
            if m is None:
                return None
            out.append(m)
        return out

    gran, metas = 128, probe_meta(7, 16)
    if metas is None:
        gran, metas = 1024, probe_meta(10, 12)
    K = max(m[1].shape[1] for m in metas) if metas else 0

    # row-phase lists (unified width)
    kr = 0
    if True:
        ks = []
        for s in range(S):
            _, k_s = gp.row_meta_np(part.rowends_local[s], NZ, T, r_win)
            if k_s == 0:
                ks = None
                break
            ks.append(k_s)
        kr = max(ks) if ks else 0

    plan = dataclasses.replace(
        plan0, r_win=int(r_win), row_span=int(row_span),
        meta_k=int(K), meta_gran=gran, row_meta_k=int(kr), x_win=0,
        runtime_skip=bool(R / max(num_tiles, 1) < 0.5 * r_win
                          or NZ / max(num_tiles, 1) < 0.5 * T))

    # --- stacked per-shard arrays ------------------------------------ #
    values_p = np.zeros((S, NZ + TE), np.float32)
    cols_p = np.zeros((S, NZ + TE), np.int32)
    rowends_p = np.zeros((S, out_len), np.int32)
    tile_rows = np.zeros((S, num_tiles + 1), np.int32)
    tile_nnz = np.zeros((S, num_tiles + 1), np.int32)
    tile_flags = np.zeros((S, num_tiles + 1), np.int32)
    cbase = np.zeros((S, num_tiles + 1), np.int32)
    meta_pk = None
    rowmeta = None
    for s in range(S):
        values_p[s, :NZ] = part.values[s].astype(np.float32)
        cols_p[s, :NZ] = part.col_indices[s]
        cols_p[s, NZ:] = part.col_indices[s][-1]
        rowends_p[s, :R] = part.rowends_local[s]
        rowends_p[s, R:] = NZ
        trs, tns = merge_tile_coordinates_np(part.rowends_local[s], NZ, T)
        tile_rows[s] = trs
        tile_nnz[s] = tns
        row1 = trs[1:]
        re_at = rowends_p[s][np.maximum(row1 - 1, 0)]
        tile_flags[s, :num_tiles] = ((row1 > trs[:-1])
                                     & (re_at >= tns[1:])).astype(np.int32)
        if metas is not None:
            cnt, lst = metas[s]
            if lst.shape[1] < K:
                lst = np.pad(lst, ((0, 0), (0, K - lst.shape[1])),
                             constant_values=-1)
            pk = gp.pack_tile_meta_np(cnt, lst, tns, T)
            if meta_pk is None:
                meta_pk = np.zeros((S, pk.shape[0]), np.int32)
            meta_pk[s] = pk
        if kr:
            rm, k_s = gp.row_meta_np(part.rowends_local[s], NZ, T, r_win,
                                     k_force=kr)
            assert k_s == kr
            if rowmeta is None:
                rowmeta = np.zeros((S, rm.shape[0]), np.int32)
            rowmeta[s] = rm

    arrays = {"values_p": values_p, "cols_p": cols_p,
              "rowends_p": rowends_p, "tile_rows": tile_rows,
              "tile_nnz": tile_nnz, "cbase": cbase,
              "tile_flags": tile_flags, "meta": meta_pk,
              "rowmeta": rowmeta}

    # --- halo overlap split (north star: halo exchange overlapped with
    # compute).  The merge kernel runs INTERIOR items only (columns in
    # the shard's own x block — boundary values zeroed, x padded with
    # zeros in the halo lanes), so it carries NO data dependency on the
    # ppermutes; XLA's latency-hiding scheduler can then run the halo
    # exchange under the kernel.  The few boundary items are a compact
    # per-shard segment-sum once the halo lands. ---------------------- #
    if part.x_mode == "halo" and part.halo:
        H, cpad = part.halo, part.cpad
        bcnt = []
        bidx = []
        for s in range(S):
            ln = int(part.meta[s, 3])
            wcols = part.col_indices[s][:ln]
            bmask = (wcols < H) | (wcols >= H + cpad)
            bidx.append(np.nonzero(bmask)[0])
            bcnt.append(len(bidx[-1]))
        bmax = max(8, -(-max(bcnt) // 8) * 8) if max(bcnt) else 0
        if bmax:
            bvals = np.zeros((S, bmax), np.float32)
            bcols = np.zeros((S, bmax), np.int32)
            brows = np.full((S, bmax), part.rows_max - 1, np.int32)
            for s in range(S):
                ids = bidx[s]
                if len(ids):
                    bvals[s, :len(ids)] = part.values[s][ids]
                    bcols[s, :len(ids)] = part.col_indices[s][ids]
                    rowe = part.rowends_local[s].astype(np.int64)
                    brows[s, :len(ids)] = np.searchsorted(
                        rowe, ids, side="right").astype(np.int32)
                    # zero the boundary values in the interior kernel
                    values_p[s, ids] = 0.0
            arrays["bvals"] = bvals
            arrays["bcols"] = bcols
            arrays["brows"] = brows
    return plan, arrays


def distributed_csrmv_fn(mesh, part: MergePartition, axis: str = "shards",
                         alpha: float = 1.0, local_backend: str = "auto",
                         prepared=None):
    """Build the jitted SPMD csrmv for a fixed partition.

    Returns fn(values_sh, cols_sh, rowends_sh, meta_sh, x) -> y windows
    [S, rows_max] sharded along `axis`.  x is [S, cpad] sharded in halo
    mode, or the replicated global [C] otherwise.

    ``local_backend``: the per-shard SpMV. "pallas" runs the merge-path
    kernel on each chip (interpret mode off-TPU); "xla" the segment-sum
    formulation; "auto" picks pallas on TPU meshes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    S = part.num_shards
    rows_max = part.rows_max
    nnz_max = part.nnz_max
    halo_mode = part.x_mode == "halo"
    H = part.halo
    cpad = part.cpad

    platform = mesh.devices.flat[0].platform
    if local_backend == "auto":
        local_backend = "pallas" if platform == "tpu" else "xla"
    local_plan = None
    if local_backend == "pallas" and prepared is None:
        from merge_spmv_tpu.ops.plan import make_plan
        local_plan = make_plan(rows_max, part.local_x_width, nnz_max,
                               dtype="float32", backend="pallas")

    def halo_x(x):
        if halo_mode:
            xb = x[0]
            if H and S > 1:
                lh = jax.lax.ppermute(
                    xb[cpad - H:], axis,
                    perm=[(i, i + 1) for i in range(S - 1)])
                rh = jax.lax.ppermute(
                    xb[:H], axis, perm=[(i, i - 1) for i in range(1, S)])
                return jnp.concatenate([lh, xb, rh])
            return xb
        return x

    def carry_exchange(y_local, meta):
        # carry out: partial of the spanning row (window index `owned`,
        # present iff owned < local_rows); routed by precomputed dst
        owned = meta[0, 4]
        carry_dst = meta[0, 5]
        local_rows = meta[0, 2]
        spanning = owned < local_rows
        carry_val = jnp.where(
            spanning,
            jnp.take(y_local, jnp.minimum(owned, rows_max - 1)), 0.0)
        routed = jnp.zeros((S,), y_local.dtype).at[carry_dst].set(carry_val)
        # reduce-scatter: shard d receives sum of carries routed to d —
        # by construction all of them target d's first local row
        received = jax.lax.psum_scatter(routed, axis, scatter_dimension=0,
                                        tiled=True)
        w = jnp.arange(rows_max, dtype=jnp.int32)
        y_owned = jnp.where(w < owned, y_local, 0.0)
        y_owned = y_owned.at[0].add(received[0])
        return y_owned[None]

    if prepared is not None:
        # prepared SPMD path: per-shard gather/row lists + fused tile
        # coordinates under one unified plan (prepare_distributed_csrmv)
        pplan, _arr = prepared
        from merge_spmv_tpu.ops.csrmv_pallas import _csrmv_pallas_core

        base_names = ("values_p", "cols_p", "rowends_p", "tile_rows",
                      "tile_nnz", "cbase", "tile_flags")
        opt_names = tuple(n for n in ("meta", "rowmeta", "bvals", "bcols",
                                      "brows") if _arr.get(n) is not None)
        all_names = base_names + opt_names
        split_halo = "bvals" in opt_names

        def shard_body_prep(*args):
            sh_arr = dict(zip(all_names, args[:len(all_names)]))
            meta_s, x = args[len(all_names)], args[len(all_names) + 1]
            pm = sh_arr.get("meta")
            prm = sh_arr.get("rowmeta")
            if split_halo:
                # interior kernel sees zeros in the halo lanes: it has NO
                # dependency on the ppermutes, so the halo exchange can be
                # scheduled under it (latency hiding on real meshes).
                # The optimization barrier stops XLA from multi-output-
                # fusing this zero-padded build with the halo concat
                # (they share xb) — that fusion made the kernel's packed
                # x table transitively depend on collective-permute-done,
                # serializing the exchange BEFORE the kernel in the
                # round-5 v5e:2x4 AOT schedule (HALO_OVERLAP.json).
                xb = jax.lax.optimization_barrier(x[0])
                zh = jnp.zeros((H,), xb.dtype)
                x_loc = jnp.concatenate([zh, xb, zh])
            else:
                x_loc = halo_x(x)
            y_local = _csrmv_pallas_core(
                pplan, sh_arr["values_p"][0], sh_arr["cols_p"][0],
                sh_arr["rowends_p"][0], sh_arr["tile_rows"][0],
                sh_arr["tile_nnz"][0], sh_arr["cbase"][0],
                sh_arr["tile_flags"][0],
                pm[0] if pm is not None else None,
                alpha * x_loc, None,
                prm[0] if prm is not None else None,
                meta_is_list=bool(pplan.meta_k) and pm is not None,
                interpret=platform != "tpu")
            if split_halo:
                # the few boundary items run as a compact segment-sum on
                # the exchanged halo window
                x_h = halo_x(x)
                prods = (alpha * sh_arr["bvals"][0]
                         * jnp.take(x_h, sh_arr["bcols"][0], axis=0))
                y_bnd = jax.ops.segment_sum(prods, sh_arr["brows"][0],
                                            num_segments=rows_max)
                y_local = y_local + y_bnd
            return carry_exchange(y_local, meta_s)

        x_spec2 = P(axis) if halo_mode else P()
        mapped = jax.shard_map(
            shard_body_prep, mesh=mesh,
            in_specs=(P(axis),) * (len(all_names) + 1) + (x_spec2,),
            out_specs=P(axis), check_vma=False)
        fnj = jax.jit(mapped)

        def fn(*args):
            return fnj(*args)

        # consistent return shape (verdict r4 weak #9): always return
        # the callable alone; the prepared arg order rides as metadata
        fn.arg_names = all_names + ("meta", "x")
        return fn

    def shard_body(values, cols, rowends, meta, x):
        # shapes: [1, nnz_max], [1, rows_max], [1, 6];
        # x: [1, cpad] (halo) or replicated [C]
        values = values[0]
        cols = cols[0]
        rowends = rowends[0]
        owned = meta[0, 4]
        carry_dst = meta[0, 5]

        if halo_mode:
            xb = x[0]
            if H and S > 1:
                lh = jax.lax.ppermute(
                    xb[cpad - H:], axis,
                    perm=[(i, i + 1) for i in range(S - 1)])
                rh = jax.lax.ppermute(
                    xb[:H], axis, perm=[(i, i - 1) for i in range(1, S)])
                x_loc = jnp.concatenate([lh, xb, rh])
            else:
                x_loc = xb
        else:
            x_loc = x

        if local_plan is not None:
            from merge_spmv_tpu.ops.csrmv_pallas import csrmv_pallas
            y_local = csrmv_pallas(local_plan, values, rowends, cols,
                                   alpha * x_loc,
                                   interpret=platform != "tpu")
        else:
            y_local = _local_csrmv_xla(values, cols, rowends,
                                       alpha * x_loc, nnz_max)

        # carry out: partial of the spanning row (window index `owned`,
        # present iff owned < local_rows); routed by precomputed dst
        local_rows = meta[0, 2]
        spanning = owned < local_rows
        carry_val = jnp.where(
            spanning,
            jnp.take(y_local, jnp.minimum(owned, rows_max - 1)), 0.0)
        routed = jnp.zeros((S,), y_local.dtype).at[carry_dst].set(carry_val)
        # reduce-scatter: shard d receives sum of carries routed to d —
        # by construction all of them target d's first local row
        received = jax.lax.psum_scatter(routed, axis, scatter_dimension=0,
                                        tiled=True)

        w = jnp.arange(rows_max, dtype=jnp.int32)
        y_owned = jnp.where(w < owned, y_local, 0.0)
        y_owned = y_owned.at[0].add(received[0])
        return y_owned[None]

    x_spec = P(axis) if halo_mode else P()
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), x_spec),
        out_specs=P(axis),
        # pallas_call outputs do not carry varying-mesh-axis metadata yet
        check_vma=False)
    fnj = jax.jit(mapped)

    def fn(*args):
        return fnj(*args)

    fn.arg_names = ("values", "cols", "rowends", "meta", "x")
    return fn


def distributed_csrmv(mesh, part: MergePartition, x, axis: str = "shards",
                      alpha: float = 1.0, local_backend: str = "auto"):
    """One-shot convenience: place shares, run, return sharded windows."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    arrays = part.to_device_sharded(mesh, axis)
    if part.x_mode == "halo":
        xr = jax.device_put(jnp.asarray(part.shard_x(x)),
                            NamedSharding(mesh, P(axis)))
    else:
        xr = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
    fn = distributed_csrmv_fn(mesh, part, axis, alpha, local_backend)
    return fn(*arrays, xr)


class PreparedDistributedCsrmv:
    """Prepared SPMD operator: build once (per-shard gather/row lists,
    tile coordinates, padded arrays, device placement), call per x —
    the multi-chip analog of the single-chip SpmvOperator fast path."""

    def __init__(self, mesh, part: MergePartition, dtype="float32",
                 axis: str = "shards", alpha: float = 1.0,
                 tile_items=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.part, self.mesh, self.axis = part, mesh, axis
        self.plan, self.arrays = prepare_distributed_csrmv(
            part, dtype, tile_items)
        self.fn = distributed_csrmv_fn(
            mesh, part, axis, alpha, "pallas",
            prepared=(self.plan, self.arrays))
        self._names = self.fn.arg_names[:-2]   # sharded array args
        sh = NamedSharding(mesh, P(axis))
        self._placed = tuple(jax.device_put(self.arrays[n], sh)
                             for n in self._names)
        self._meta_d = jax.device_put(part.meta, sh)

    def __call__(self, x):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.part.x_mode == "halo":
            xr = jax.device_put(
                jnp.asarray(self.part.shard_x(np.asarray(x))),
                NamedSharding(self.mesh, P(self.axis)))
        else:
            xr = jax.device_put(jnp.asarray(x),
                                NamedSharding(self.mesh, P()))
        return self.fn(*self._placed, self._meta_d, xr)


def materialize_y(y_windows, part: MergePartition) -> np.ndarray:
    """Assemble the dense global y from exclusive per-shard windows."""
    yw = np.asarray(y_windows)
    out = np.zeros(part.num_rows, dtype=yw.dtype)
    for s in range(part.num_shards):
        r0 = int(part.row_starts[s])
        r1 = int(part.row_starts[s + 1])
        if r1 > r0:
            out[r0:r1] += yw[s, :r1 - r0]
    return out
