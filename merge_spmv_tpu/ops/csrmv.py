"""Public CsrMV / CsrMM API (reference: DeviceSpmv::CsrMV,
cub/device/device_spmv.cuh:129-164).

Two-phase contract (SURVEY.md §3.3): build a `SpmvPlan` once with
`make_plan(...)`, then call `csrmv(plan, ...)` many times — the plan is the
static jit key, so repeat calls hit the compilation cache (the TPU analog of
the reference's query/allocate/run + caching allocator).

Unlike the reference device API (alpha=1, beta=0 hardcoded at
device_spmv.cuh:155-156), the full ``y = alpha*A*x + beta*y_in`` epilogue is
supported on every backend, matching the CPU driver's gold semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from merge_spmv_tpu.ops.plan import SpmvPlan, make_plan
from merge_spmv_tpu.ops import csrmv_xla as _xla

__all__ = ["csrmv", "csrmm", "csrmv_fn", "make_plan", "SpmvPlan"]


@functools.lru_cache(maxsize=256)
def _jitted_csrmv(plan: SpmvPlan, has_y_in: bool, has_meta: bool,
                  interpret: bool):
    """Compile (and cache) the csrmv executable for a plan."""
    if plan.backend == "pallas":
        from merge_spmv_tpu.ops import csrmv_pallas as _pallas
        kernel = functools.partial(_pallas.csrmv_pallas, plan,
                                   interpret=interpret)
    elif plan.backend == "pallas_ds":
        import dataclasses

        from merge_spmv_tpu.ops import csrmv_pallas as _pallas
        plan32 = dataclasses.replace(plan, dtype="float32",
                                     backend="pallas")
        base = functools.partial(_pallas.csrmv_pallas, plan32,
                                 interpret=interpret)

        def kernel(values, row_end_offsets, col_indices, x, y_in, alpha,
                   beta, meta):
            # double-single split: fp64 operands become hi+lo fp32 pairs;
            # y = A_hi x_hi + A_hi x_lo + A_lo x_hi keeps products accurate
            # to ~2^-48 (accumulation is fp32 — the reference itself only
            # verifies fp64 to fp32 ULP distance, utils.h:726-728)
            v_hi = values.astype(jnp.float32)
            v_lo = (values - v_hi.astype(values.dtype)).astype(jnp.float32)
            x_hi = x.astype(jnp.float32)
            x_lo = (x - x_hi.astype(x.dtype)).astype(jnp.float32)
            y = base(v_hi, row_end_offsets, col_indices, x_hi, meta=meta)
            y = base(v_hi, row_end_offsets, col_indices, x_lo,
                     y_in=y, beta=1.0, meta=meta)
            y = base(v_lo, row_end_offsets, col_indices, x_hi,
                     y_in=y, beta=1.0, meta=meta)
            y = (alpha * y).astype(values.dtype)
            if y_in is not None:
                y = y + beta * y_in
            return y
    else:
        kernel = None

    def run(values, row_end_offsets, col_indices, x, y_in, alpha, beta,
            meta):
        if kernel is not None:
            if plan.backend == "pallas_ds":
                return kernel(values, row_end_offsets, col_indices, x,
                              y_in, alpha, beta, meta)
            y = kernel(values, row_end_offsets, col_indices, x,
                       y_in=y_in, alpha=alpha, beta=beta, meta=meta)
            # the fp32 pallas kernel must hand back the plan dtype (bf16
            # plans would otherwise silently widen)
            return y.astype(jnp.dtype(plan.dtype))
        return _xla.csrmv_xla(values, row_end_offsets, col_indices, x,
                              y_in=y_in, alpha=alpha, beta=beta)

    def fn(v, re, ci, x, a, b, y_in=None, meta=None):
        return run(v, re, ci, x, y_in, a, b, meta)
    return jax.jit(fn, static_argnames=())


def csrmv(plan: SpmvPlan, values, row_end_offsets, col_indices, x,
          y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
          meta=None):
    """y = alpha * A @ x + beta * y_in.

    Parameters mirror DeviceSpmv::CsrMV (device_spmv.cuh:129-164), with
    `row_end_offsets` = row_offsets[1:] (merge list A).  ``meta`` is the
    optional per-matrix gather plan (ops/gather_plan.py), managed by
    SpmvOperator (ops/operator.py).
    """
    dtype = jnp.dtype(plan.dtype)
    alpha = jnp.asarray(alpha, dtype=dtype)
    beta = jnp.asarray(beta, dtype=dtype)
    fn = _jitted_csrmv(plan, y_in is not None, meta is not None, interpret)
    kw = {}
    if y_in is not None:
        kw["y_in"] = y_in
    if meta is not None:
        kw["meta"] = meta
    return fn(values, row_end_offsets, col_indices, x, alpha, beta, **kw)


def csrmv_fn(plan: SpmvPlan, interpret: bool = False, has_meta: bool = False):
    """Return the raw jitted function for benchmarking loops."""
    return _jitted_csrmv(plan, False, has_meta, interpret)


@functools.lru_cache(maxsize=256)
def _jitted_csrmm(plan: SpmvPlan, has_y_in: bool, has_meta: bool,
                  interpret: bool):
    if plan.backend == "pallas":
        from merge_spmv_tpu.ops import csrmv_pallas as _pallas
        kernel = functools.partial(_pallas.csrmm_column_loop, plan,
                                   interpret=interpret)
    else:
        kernel = None

    def run(values, row_end_offsets, col_indices, X, Y_in, alpha, beta,
            meta):
        if kernel is not None:
            return kernel(values, row_end_offsets, col_indices, X,
                          Y_in=Y_in, alpha=alpha, beta=beta, meta=meta)
        return _xla.csrmm_xla(values, row_end_offsets, col_indices, X,
                              Y_in=Y_in, alpha=alpha, beta=beta)

    def fn(v, re, ci, X, a, b, Y_in=None, meta=None):
        return run(v, re, ci, X, Y_in, a, b, meta)
    return jax.jit(fn)


def csrmm(plan: SpmvPlan, values, row_end_offsets, col_indices, X,
          Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False,
          meta=None):
    """Y = alpha * A @ X + beta * Y_in  (SpMM; X is [num_cols, k])."""
    dtype = jnp.dtype(plan.dtype)
    alpha = jnp.asarray(alpha, dtype=dtype)
    beta = jnp.asarray(beta, dtype=dtype)
    fn = _jitted_csrmm(plan, Y_in is not None, meta is not None, interpret)
    kw = {}
    if Y_in is not None:
        kw["Y_in"] = Y_in
    if meta is not None:
        kw["meta"] = meta
    return fn(values, row_end_offsets, col_indices, X, alpha, beta, **kw)
