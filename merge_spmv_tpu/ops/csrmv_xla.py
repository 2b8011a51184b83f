"""XLA segment-sum CsrMV/CsrMM — the device golden model and fallback.

This is the fully-fused, compiler-scheduled formulation:

    row_ids  = searchsorted(row_end_offsets, 0..nnz-1, side='right')
    products = values * x[col_indices]
    y        = alpha * segment_sum(products, row_ids) + beta * y_in

It is numerically the same reduce-value-by-key computation the reference's
fix-up kernel performs (agent_segment_fixup.cuh:226-341) applied to the whole
matrix at once, and inherits XLA's deterministic reduction order.  Used as:

* the universal fallback (fp64, num_cols==1 degenerate path, x too large
  for VMEM, non-TPU platforms),
* the differential-test oracle for the Pallas kernel,
* the baseline the benchmark driver reports alongside the merge kernel
  (the role MKL/cuSPARSE play in the reference drivers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["csrmv_xla", "csrmm_xla", "row_ids_from_offsets"]


def row_ids_from_offsets(row_end_offsets, num_nonzeros: int):
    """Per-nonzero row id: first r with row_end_offsets[r] > j.

    Empty rows are skipped naturally (equal consecutive end offsets).
    """
    j = jnp.arange(num_nonzeros, dtype=jnp.int32)
    return jnp.searchsorted(row_end_offsets, j, side="right").astype(jnp.int32)


def csrmv_xla(values, row_end_offsets, col_indices, x,
              y_in=None, alpha=1.0, beta=0.0):
    """y = alpha * A @ x + beta * y_in  over CSR arrays.

    Shapes: values/col_indices [nnz], row_end_offsets [num_rows], x
    [num_cols].  Semantics parity with SpmvGold (cpu_spmv.cpp:257-277):
    duplicate coordinates accumulate, empty rows yield beta*y_in.
    """
    num_rows = row_end_offsets.shape[0]
    nnz = values.shape[0]
    if nnz == 0:
        base = jnp.zeros((num_rows,), dtype=values.dtype)
    else:
        row_ids = row_ids_from_offsets(row_end_offsets, nnz)
        products = values * jnp.take(x, col_indices, axis=0)
        base = jax.ops.segment_sum(products, row_ids, num_segments=num_rows)
    y = alpha * base
    if y_in is not None:
        y = y + beta * y_in
    return y


def csrmm_xla(values, row_end_offsets, col_indices, X,
              Y_in=None, alpha=1.0, beta=0.0):
    """Y = alpha * A @ X + beta * Y_in, X: [num_cols, k]."""
    num_rows = row_end_offsets.shape[0]
    nnz = values.shape[0]
    if nnz == 0:
        base = jnp.zeros((num_rows, X.shape[1]), dtype=values.dtype)
    else:
        row_ids = row_ids_from_offsets(row_end_offsets, nnz)
        gathered = jnp.take(X, col_indices, axis=0)       # [nnz, k]
        products = gathered * values[:, None]
        base = jax.ops.segment_sum(products, row_ids, num_segments=num_rows)
    Y = alpha * base
    if Y_in is not None:
        Y = Y + beta * Y_in
    return Y
