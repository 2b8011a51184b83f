"""Timing harness (parity: utils.h:528-658 + the drivers' discipline).

The reference measures a backend as: 1 verification pass, 3 cache-warming
passes, then N timed iterations where N adaptively targets 16 G nonzeros of
total work (cpu_spmv.cpp:611-616; GPU cap 50,000, gpu_spmv.cu:491-493).  On
TPU the same discipline applies with two twists: the first call pays XLA
compilation (excluded via warmup) and timing must block on device completion
(`block_until_ready`, the analog of cudaEventSynchronize).
"""

from __future__ import annotations

import time

__all__ = ["Timer", "adaptive_timing_iterations", "time_device_fn"]


class Timer:
    """Wall-clock timer with the CpuTimer Start/Stop/ElapsedMillis surface."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self):
        self._elapsed = time.perf_counter() - self._start
        return self

    def elapsed_millis(self) -> float:
        return self._elapsed * 1e3

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def adaptive_timing_iterations(num_nonzeros: int, max_iterations: int = 50000,
                               min_iterations: int = 100,
                               target_nnz: int = 16 << 30) -> int:
    """Iteration count targeting `target_nnz` total nonzeros processed
    (cpu_spmv.cpp:611-616 with the GPU driver's 50k cap)."""
    if num_nonzeros <= 0:
        return min_iterations
    return int(min(max_iterations, max(min_iterations, target_nnz // num_nonzeros)))


def time_device_fn(fn, *args, iterations: int = 100, warmup: int = 3):
    """Time a device function: returns average milliseconds per call.

    `fn(*args)` must return one or more jax arrays; completion is awaited via
    block_until_ready on the last output (the analog of GpuTimer's
    cudaEvent pair around the launch loop, utils.h:624-658).

    NOTE: on relayed/async device transports (axon tunnel),
    block_until_ready may not reflect device completion and repeated
    identical dispatches can be elided; prefer `chained_rate_ms` there.
    """
    import jax

    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    jax.block_until_ready(out)

    t = Timer().start()
    for _ in range(iterations):
        out = fn(*args)
    jax.block_until_ready(out)
    t.stop()
    return t.elapsed_millis() / iterations


def chained_rate_ms(step_fn, x0, n1: int = 5, n2: int = 20, reps: int = 3,
                    warmup: int = 2, jitter_floor_ms: float = 2.0,
                    max_n2: int = 640, return_info: bool = False):
    """Robust per-iteration milliseconds via the chained-difference method.

    `step_fn(x) -> x'` must make iteration k+1 data-depend on iteration k
    (defeats dispatch elision), and the measurement reads back a full
    reduction of the final value (defeats async-transport early returns and
    dead-code elimination through the chain).  The fixed costs (dispatch,
    transfer latency) cancel in the difference t(n2) - t(n1).

    When the difference is below ``jitter_floor_ms`` (kernel faster than
    transport jitter), the chain lengths are doubled until it clears the
    floor or ``max_n2`` is reached.  A rate derived from a floored
    difference is a lie (round-2's corpus artifact printed 262 TFLOP/s for
    SpMV this way), so an unresolved measurement returns NaN — callers must
    report it as below-resolution, never as a rate.

    This is the TPU-tunnel-safe analog of the reference's timed loop around
    N kernel launches (gpu_spmv.cu:418-429).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    import numpy as np

    def run_chain(iters):
        x = x0
        t0 = _time.perf_counter()
        for _ in range(iters):
            x = step_fn(x)
        # full-reduction readback: depends on every element of the result
        np.asarray(jax.device_get(jnp.sum(x)))
        return _time.perf_counter() - t0

    run_chain(warmup)
    while True:
        t1 = min(run_chain(n1) for _ in range(reps))
        t2 = min(run_chain(n2) for _ in range(reps))
        diff_ms = (t2 - t1) * 1e3
        if diff_ms >= jitter_floor_ms:
            ms = diff_ms / (n2 - n1)
            if return_info:
                return ms, True, n2
            return ms
        if n2 >= max_n2:
            # unresolved: expose the noisy estimate only alongside an
            # explicit resolved=False; the bare-float contract gets NaN
            ms = float("nan") if diff_ms <= 0 else diff_ms / (n2 - n1)
            if return_info:
                return ms, False, n2
            return float("nan")
        n1, n2 = n1 * 2, n2 * 2


def ingraph_rate_ms(step_fn, x0, steps: int = 64, reps: int = 5,
                    jitter_floor_ms: float = 50.0, max_steps: int = 4096,
                    return_info: bool = False):
    """Per-iteration milliseconds via an IN-GRAPH ``lax.fori_loop`` chain.

    ``chained_rate_ms`` issues one dispatch per iteration; consecutive
    enqueues pipeline, so the measured rate absorbs the CURRENT per-dispatch
    cost of the remote tunnel — which drifts by 100s of microseconds
    between sessions (round-4 measured the same kernel at 0.50 and 0.78 ms
    minutes apart this way).  Here ONE dispatch runs the whole chain on
    device (the pattern bench.py already used for the sub-dispatch-cost DIA
    kernel), so only device time is in the difference
    ``t(chain(steps)) - t(chain(1))``.

    ``step_fn`` must be traceable (jit-of-jit is fine) and make iteration
    k+1 data-depend on iteration k.  Costs two extra compiles (the two
    chain lengths).  Returns NaN when the difference never clears
    ``jitter_floor_ms`` (then report below-resolution, never a rate).

    ``jitter_floor_ms`` defaults to 50 ms — the single-dispatch baseline
    carries the tunnel's per-dispatch jitter (±8 ms observed), so the
    chain difference must dwarf it or the rate inherits up to
    jitter/steps of error (a 64-step chain of a 0.5 ms kernel measured
    0.26-0.54 ms for the same plan before this floor).

    When ``step_fn`` carries ``.raw``/``.args`` attributes (every
    *_step_fn builder in this module attaches them), the matrix arrays
    ride as jit ARGUMENTS of the chain — a closure capture would embed
    them in the remote-compile payload (HTTP 413 at circuit5M scale).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    import numpy as np

    raw = getattr(step_fn, "raw", None)
    args = getattr(step_fn, "args", ())
    chain = getattr(step_fn, "chain", None)

    # The chain length rides as a RUNTIME argument (fori_loop lowers to a
    # While either way), so ONE compile serves the 1-step baseline, the
    # N-step chain, and every doubling — the per-length compiles were the
    # dominant cost of a corpus-sweep row (2-3 remote kernel compiles per
    # matrix on top of the operator build's, round 5).  A step_fn carrying
    # ``.chain`` (fn(x, n, *args) -> pytree with the chained x as leaf 0)
    # is used as-is — the driver shares one compiled module between
    # verification and timing.
    if chain is not None:
        fn = chain
    elif raw is not None:
        fn = jax.jit(lambda x, n, *a: jax.lax.fori_loop(
            0, n, lambda i, xc: raw(xc, *a), x))
    else:
        fn = jax.jit(lambda x, n, *a: jax.lax.fori_loop(
            0, n, lambda i, xc: step_fn(xc), x))

    def run(n):
        out = fn(x0, jnp.int32(n), *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[:1]))   # force completion
        return out

    run(1)   # compile + warm (serves every length)

    def timed(n):
        t0 = _time.perf_counter()
        run(n)
        return _time.perf_counter() - t0

    while True:
        # interleave the two lengths so a congestion burst on the tunnel
        # cannot hit only one of them (consecutive same-length reps are
        # not independent samples)
        one = big = 1e30
        for _ in range(reps):
            one = min(one, timed(1))
            big = min(big, timed(steps))
        diff_ms = (big - one) * 1e3
        if diff_ms >= jitter_floor_ms:
            ms = diff_ms / (steps - 1)
            return (ms, True, steps) if return_info else ms
        if steps >= max_steps:
            ms = float("nan") if diff_ms <= 0 else diff_ms / (steps - 1)
            return (ms, False, steps) if return_info else float("nan")
        steps *= 2


def operator_step_fn(op):
    """Chained-timing step for a SpmvOperator with the matrix arrays passed
    as jit ARGUMENTS.

    A `jax.jit(lambda x: op(x) ...)` closure captures the device-resident
    CSR arrays as compile-time constants; on relayed compile services
    (axon tunnel) those constants ride inside the compile request, which
    overflows the request-size limit for large matrices (HTTP 413 at
    ~680 MB for a circuit5M-class matrix).  Passing them as runtime
    arguments keeps the payload to the HLO alone.
    """
    import functools

    import jax
    import jax.numpy as jnp

    plan = op.plan
    ncols = plan.num_cols

    if getattr(op, "_prep", None) is not None and plan.backend == "pallas":
        from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call
        prep = op._prep
        arrs = (prep.values_p, prep.cols_p, prep.rowends_p,
                prep.tile_rows, prep.tile_nnz, prep.cbase,
                prep.tile_flags, prep.meta)
        rowmeta = prep.rowmeta
        p32 = op._plan32

        @jax.jit
        def _step(xc, *a):
            y = _prepared_call(
                p32, *a[:8], xc, None, jnp.float32(1.0), jnp.float32(0.0),
                a[8] if len(a) > 8 else None,
                meta_is_list=prep.meta_is_list, alpha_one=True,
                interpret=False)
            if plan.num_rows >= ncols:
                return xc + y[:ncols] * 1e-20
            return xc + jnp.pad(y, (0, ncols - plan.num_rows)) * 1e-20

        @jax.jit
        def _chain(xc, n, *a):
            # one module serves verification (n=1: y = A@x exactly) and
            # every timing chain length — the separate verify-call and
            # per-length chain compiles dominated a corpus-sweep row
            rm = a[8] if len(a) > 8 else None

            def body(i, c):
                xcc, _ = c
                yv = _prepared_call(
                    p32, *a[:8], xcc, None, jnp.float32(1.0),
                    jnp.float32(0.0), rm,
                    meta_is_list=prep.meta_is_list, alpha_one=True,
                    interpret=False)
                if plan.num_rows >= ncols:
                    nxt = xcc + yv[:ncols] * 1e-20
                else:
                    nxt = xcc + jnp.pad(yv,
                                        (0, ncols - plan.num_rows)) * 1e-20
                return (nxt, yv)

            y0 = jnp.zeros((plan.num_rows,), jnp.float32)
            return jax.lax.fori_loop(0, n, body, (xc, y0))

        if rowmeta is not None:
            arrs = arrs + (rowmeta,)
        step = lambda xc: _step(xc, *arrs)   # noqa: E731
        step.raw, step.args = _step, arrs
        step.chain = _chain
        return step

    if getattr(op, "_prep", None) is not None and plan.backend == "pallas_ds":
        # prepared FUSED double-single route: one kernel pass over the
        # (hi, lo) prepared arrays (csrmv_pallas.prepare_csrmv_ds) — the
        # generic dispatcher below would re-pad and re-search per call
        from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call_ds
        prep = op._prep
        p32 = op._plan32
        arrs = (prep.values_p, prep.cols_p, prep.rowends_p,
                prep.tile_rows, prep.tile_nnz, prep.cbase,
                prep.tile_flags, prep.meta)
        rowmeta = prep.rowmeta

        @jax.jit
        def _step_ds(xc, *a):
            rm = a[8] if len(a) > 8 else None
            one = jnp.asarray(1.0, xc.dtype)
            y = _prepared_call_ds(p32, *a[:8], xc, None, one, one, rm,
                                  meta_is_list=prep.meta_is_list,
                                  interpret=False)
            y = y.astype(xc.dtype)
            if plan.num_rows >= ncols:
                return xc + y[:ncols] * 1e-20
            return xc + jnp.pad(y, (0, ncols - plan.num_rows)) * 1e-20

        if rowmeta is not None:
            arrs = arrs + (rowmeta,)
        step = lambda xc: _step_ds(xc, *arrs)   # noqa: E731
        step.raw, step.args = _step_ds, arrs
        return step

    # generic fallback: arrays as arguments through the csrmv dispatcher
    from merge_spmv_tpu.ops.csrmv import csrmv

    @functools.partial(jax.jit, static_argnames=("has_meta",))
    def _step2(xc, v, re_, ci, meta, has_meta):
        y = csrmv(plan, v, re_, ci, xc,
                  meta=meta if has_meta else None).astype(xc.dtype)
        if plan.num_rows >= ncols:
            return xc + y[:ncols] * 1e-20
        return xc + jnp.pad(y, (0, ncols - plan.num_rows)) * 1e-20

    meta = op.meta
    has_meta = meta is not None
    if not has_meta:
        meta = jnp.zeros((1,), jnp.int32)
    step = lambda xc: _step2(xc, op.values, op.row_end_offsets,  # noqa: E731
                             op.col_indices, meta, has_meta=has_meta)
    step.raw = lambda xc, v, re_, ci, mt: _step2(xc, v, re_, ci, mt,
                                                 has_meta=has_meta)
    step.args = (op.values, op.row_end_offsets, op.col_indices, meta)
    return step


def split_operator_step_fn(sop):
    """Chained-timing step for a SplitSpmvOperator (ops/split.py): the
    stacked-band kernel plus its reshape-sum epilogue inside one jit, with
    the prepared arrays riding as jit ARGUMENTS (a closure would embed
    them in the remote-compile payload — HTTP 413 at circuit5M scale).
    """
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call

    op = sop.op
    assert (getattr(op, "_prep", None) is not None
            and op.plan.backend == "pallas"), \
        "split step requires a prepared pallas stacked operator"
    prep = op._prep
    p32 = op._plan32
    B, mp, m = sop.num_bands, sop._m_pad, sop.num_rows
    ncols = p32.num_cols
    arrs = [prep.values_p, prep.cols_p, prep.rowends_p, prep.tile_rows,
            prep.tile_nnz, prep.cbase, prep.tile_flags, prep.meta]
    has_rm = prep.rowmeta is not None
    if has_rm:
        arrs.append(prep.rowmeta)
    gidx = getattr(sop, "_gather_idx", None)
    if gidx is not None:
        # compact-row stack: epilogue = row-sorted gather + sorted
        # segment prefix-difference (ops/split.stack_bands_compact)
        arrs.append(gidx)
        arrs.append(sop._seg_ends)

    @jax.jit
    def _step(xc, *a):
        y_v = _prepared_call(
            p32, *a[:8], xc, None, jnp.float32(1.0), jnp.float32(0.0),
            a[8] if has_rm else None,
            meta_is_list=prep.meta_is_list, alpha_one=True,
            interpret=False)
        if gidx is not None:
            from merge_spmv_tpu.ops.csrmv_xla import _sorted_segment_sum
            gi = a[8 + int(has_rm)]
            se = a[9 + int(has_rm)]
            y = _sorted_segment_sum(jnp.take(y_v, gi, axis=0), se)
        else:
            y = y_v.reshape(B, mp)[:, :m].sum(axis=0)
        if m >= ncols:
            return xc + y[:ncols] * 1e-20
        return xc + jnp.pad(y, (0, ncols - m)) * 1e-20

    step = lambda xc: _step(xc, *arrs)   # noqa: E731
    step.raw, step.args = _step, tuple(arrs)
    return step


def hotcold_operator_step_fn(hop):
    """Chained-timing step for a HotColdSpmvOperator (ops/split.py): the
    hot launch (compact x gather) and the cold launch accumulate inside
    ONE jit step, prepared arrays riding as jit ARGUMENTS (a closure
    would embed them in the remote-compile payload — HTTP 413 at
    kron-class scale)."""
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call

    statics = []
    arr_parts = []
    for o, xidx in ((hop.hot_op, hop._xidx), (hop.cold_op, None)):
        if o is None:
            continue
        assert (getattr(o, "_prep", None) is not None
                and o.plan.backend == "pallas"), \
            "hotcold step requires prepared pallas (fp32) operators"
        prep = o._prep
        statics.append((o._plan32, prep.meta_is_list))
        arr_parts.append((prep.values_p, prep.cols_p, prep.rowends_p,
                          prep.tile_rows, prep.tile_nnz, prep.cbase,
                          prep.tile_flags, prep.meta, prep.rowmeta, xidx))
    statics = tuple(statics)
    arr_parts = tuple(arr_parts)
    m, n = hop.num_rows, hop.num_cols

    @jax.jit
    def _step(xc, parts):
        y = None
        for (p32, mil), a in zip(statics, parts):
            xin = xc if a[9] is None else jnp.take(xc, a[9])
            y = _prepared_call(
                p32, *a[:8], xin, y, jnp.float32(1.0), jnp.float32(1.0),
                a[8], meta_is_list=mil, alpha_one=True, interpret=False)
        if m >= n:
            return xc + y[:n] * 1e-20
        return xc + jnp.pad(y, (0, n - m)) * 1e-20

    step = lambda xc: _step(xc, arr_parts)   # noqa: E731
    step.raw, step.args = _step, (arr_parts,)
    return step


def dia_operator_step_fn(dop):
    """Chained-timing step for a DiaSpmvOperator (ops/dia.py): the D
    statically-shifted fused multiply-adds plus (when present) the
    leftover merge launch in ONE jit, arrays as jit ARGUMENTS."""
    import jax
    import jax.numpy as jnp

    if dop.vtab is None:
        return operator_step_fn(dop.rest_op)

    m, n = dop.num_rows, dop.num_cols
    offs = tuple(int(o) for o in dop.offsets)
    lp, rp = dop._lpad, dop._rpad
    rest = dop.rest_op
    rest_arrs = ()
    rest_static = None
    if rest is not None:
        from merge_spmv_tpu.ops.csrmv_pallas import _prepared_call
        assert (getattr(rest, "_prep", None) is not None
                and rest.plan.backend == "pallas"), \
            "dia step requires a prepared pallas leftover operator"
        prep = rest._prep
        rest_static = (rest._plan32, prep.meta_is_list)
        rest_arrs = (prep.values_p, prep.cols_p, prep.rowends_p,
                     prep.tile_rows, prep.tile_nnz, prep.cbase,
                     prep.tile_flags, prep.meta, prep.rowmeta)

    use_pallas = (getattr(dop, "_pallas_ok", False)
                  and jax.default_backend() == "tpu")

    @jax.jit
    def _step(xc, vtab, ra):
        if use_pallas:
            from merge_spmv_tpu.ops.dia_pallas import dia_matvec_pallas
            y = dia_matvec_pallas(vtab, xc.astype(vtab.dtype), offs, m, n)
        else:
            xp = jnp.pad(xc.astype(vtab.dtype), (lp, rp))
            y = jnp.zeros((m,), vtab.dtype)
            for i, off in enumerate(offs):
                s = lp + off
                y = y + vtab[i] * xp[s:s + m]
        if rest_static is not None:
            p32, mil = rest_static
            y = _prepared_call(
                p32, *ra[:8], xc, y, jnp.float32(1.0), jnp.float32(1.0),
                ra[8], meta_is_list=mil, alpha_one=True, interpret=False)
        y = y.astype(xc.dtype)
        if m >= n:
            return xc + y[:n] * 1e-20
        return xc + jnp.pad(y, (0, n - m)) * 1e-20

    step = lambda xc: _step(xc, dop.vtab, rest_arrs)   # noqa: E731
    step.raw, step.args = _step, (dop.vtab, rest_arrs)
    return step


def chain_through(y_to_x_scale=1e-12):
    """Helper making a chain step from an (args -> y) function when x and y
    have different shapes: x' = x * (1 + tanh(sum(y)) * scale)."""
    import jax.numpy as jnp

    def wrap(fn):
        def step(x, *args):
            y = fn(x, *args)
            return x * (1.0 + jnp.tanh(jnp.sum(y)) * y_to_x_scale)
        return step
    return wrap
