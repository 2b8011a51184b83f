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


# Above this nnz count the scatter-add behind jax.ops.segment_sum is
# replaced by the sorted-segment cumsum-difference form: the 57M-nnz
# wb-edu-class timing reproducibly killed the TPU worker through the
# scatter path (round 4), and a scatter of tens of millions of elements
# is the one shape XLA:TPU handles worst even when it survives.
_SCATTER_NNZ_CAP = 1 << 22


def _twofloat_exclusive_scan(x, axis=0):
    """Compensated (hi, lo) exclusive prefix scan: each prefix carries a
    residual term, so DIFFERENCES of two prefixes recover the true range
    sum to ~eps * |range sum| instead of ~eps * |global prefix| — the
    plain fp32 cumsum quantized every endpoint at ULP(|running prefix|)
    (~5e-4 at wb-edu scale), failing verification for small rows that
    straddle block boundaries (round-5 chip finding)."""

    def two_add(a, b):
        ah, al = a
        bh, bl = b
        s = ah + bh
        bp = s - ah                     # Knuth TwoSum residual
        err = (ah - (s - bp)) + (bh - bp)
        return s, al + bl + err

    zeros = jnp.zeros_like(x)
    hi, lo = jax.lax.associative_scan(two_add, (x, zeros), axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(None, -1)
    return (jnp.pad(hi[tuple(sl)], pad), jnp.pad(lo[tuple(sl)], pad))


def _sorted_segment_sum(products, row_end_offsets):
    """Segment sum over SORTED segment ids given CSR row-end offsets,
    scatter-free: block-local fp32 cumsums + a compensated (hi, lo)
    block-prefix scan, then endpoint gathers and a first-difference.

    y[r] = S(end[r]-1) - S(end[r-1]-1) with the endpoint kept as the
    TRIPLE (block-local cs, prefix hi, prefix lo) until the difference —
    summing the parts first would re-quantize at ULP(|global prefix|).
    Rounding class after the fix: ~eps * |block-local prefix| per
    endpoint, which utils/compare.py's segmented-prefix bound covers
    (same class as the merge kernel's tile-local prefixes).
    """
    nnz = products.shape[0]
    B = 1024
    nb = -(-nnz // B)
    p2 = jnp.pad(products, (0, nb * B - nnz)).reshape(nb, B)
    cs = jnp.cumsum(p2, axis=1, dtype=products.dtype)
    bh, bl = _twofloat_exclusive_scan(cs[:, -1])
    cs_flat = cs.reshape(nb * B)
    ends = row_end_offsets.astype(jnp.int32)
    prev = jnp.pad(ends[:-1], (1, 0))

    def endpoint(p):
        """(cs, bh, bl) at inclusive position p-1; S(-1) = (0, 0, 0)."""
        valid = p > 0
        pos = jnp.maximum(p - 1, 0)
        z = jnp.zeros((), products.dtype)
        c = jnp.where(valid, jnp.take(cs_flat, pos, axis=0), z)
        b = pos // B
        h = jnp.where(valid, jnp.take(bh, b, axis=0), z)
        lo_ = jnp.where(valid, jnp.take(bl, b, axis=0), z)
        return c, h, lo_

    ce, he, le = endpoint(ends)
    cs_, hs, ls = endpoint(prev)
    return (ce - cs_) + ((he - hs) + (le - ls))


def _sorted_segment_sum_2d(products, row_end_offsets):
    """k-column variant of _sorted_segment_sum for csrmm (products
    [nnz, k]): identical compensated prefix-difference math per column."""
    nnz, k = products.shape
    B = 1024
    nb = -(-nnz // B)
    p3 = jnp.pad(products, ((0, nb * B - nnz), (0, 0))).reshape(nb, B, k)
    cs = jnp.cumsum(p3, axis=1, dtype=products.dtype)
    bh, bl = _twofloat_exclusive_scan(cs[:, -1, :], axis=0)   # (nb, k)
    cs_flat = cs.reshape(nb * B, k)
    ends = row_end_offsets.astype(jnp.int32)
    prev = jnp.pad(ends[:-1], (1, 0))

    def endpoint(p):
        valid = (p > 0)[:, None]
        pos = jnp.maximum(p - 1, 0)
        z = jnp.zeros((), products.dtype)
        c = jnp.where(valid, jnp.take(cs_flat, pos, axis=0), z)
        b = pos // B
        h = jnp.where(valid, jnp.take(bh, b, axis=0), z)
        lo_ = jnp.where(valid, jnp.take(bl, b, axis=0), z)
        return c, h, lo_

    ce, he, le = endpoint(ends)
    cs_, hs, ls = endpoint(prev)
    return (ce - cs_) + ((he - hs) + (le - ls))


def csrmv_xla(values, row_end_offsets, col_indices, x,
              y_in=None, alpha=1.0, beta=0.0):
    """y = alpha * A @ x + beta * y_in  over CSR arrays.

    Shapes: values/col_indices [nnz], row_end_offsets [num_rows], x
    [num_cols].  Semantics parity with SpmvGold (cpu_spmv.cpp:257-277):
    duplicate coordinates accumulate, empty rows yield beta*y_in.
    Small matrices use jax.ops.segment_sum (the independent oracle for
    the Pallas kernel's differential tests); above _SCATTER_NNZ_CAP the
    scatter-free sorted-segment form takes over (see its docstring).
    """
    num_rows = row_end_offsets.shape[0]
    nnz = values.shape[0]
    if nnz == 0:
        base = jnp.zeros((num_rows,), dtype=values.dtype)
    else:
        products = values * jnp.take(x, col_indices, axis=0)
        if nnz > _SCATTER_NNZ_CAP:
            base = _sorted_segment_sum(products, row_end_offsets)
        else:
            row_ids = row_ids_from_offsets(row_end_offsets, nnz)
            base = jax.ops.segment_sum(products, row_ids,
                                       num_segments=num_rows)
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
        gathered = jnp.take(X, col_indices, axis=0)       # [nnz, k]
        products = gathered * values[:, None]
        if nnz > _SCATTER_NNZ_CAP:
            # same worker-killing scatter shape as csrmv (round-4
            # wb-edu crash): route through the scatter-free form
            base = _sorted_segment_sum_2d(products, row_end_offsets)
        else:
            row_ids = row_ids_from_offsets(row_end_offsets, nnz)
            base = jax.ops.segment_sum(products, row_ids,
                                       num_segments=num_rows)
    Y = alpha * base
    if Y_in is not None:
        Y = Y + beta * Y_in
    return Y
