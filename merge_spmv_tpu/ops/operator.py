"""SpmvOperator — the user-facing handle bundling a device-resident CSR
matrix with its execution plan and gather metadata.

The reference's lifecycle is query/allocate/run (DeviceSpmv::CsrMV with
d_temp_storage == NULL, SURVEY.md §3.3) plus a caching device allocator
making repeat dispatches cheap (util_allocator.cuh:101).  The TPU-native
equivalent: build once (plan + H2D upload + gather-plan upload), then every
``op(x)`` hits the jit cache and runs the compiled kernel directly.

    op = build_operator(csr, dtype="float32")
    y = op(x)                       # y = A @ x
    y = op(x, y_in=y0, alpha=2.0, beta=1.0)
    Y = op.mm(X)                    # SpMM

Setup cost (gather-plan construction + uploads) is deliberately separated
from the per-call path, mirroring how the reference reports cuSPARSE HYB
conversion time apart from HybMV time (gpu_spmv.cu:114-134).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from merge_spmv_tpu.ops.plan import SpmvPlan, make_plan

__all__ = ["SpmvOperator", "build_operator"]


class SpmvOperator:
    """Device-resident CSR SpMV/SpMM operator (two-phase contract, phase 2)."""

    def __init__(self, plan: SpmvPlan, values, row_end_offsets, col_indices,
                 meta=None):
        self.plan = plan
        self.values = values
        self.row_end_offsets = row_end_offsets
        self.col_indices = col_indices
        self.meta = meta

    def __call__(self, x, y_in=None, alpha=1.0, beta=0.0,
                 interpret: bool = False):
        from merge_spmv_tpu.ops.csrmv import csrmv
        return csrmv(self.plan, self.values, self.row_end_offsets,
                     self.col_indices, x, y_in=y_in, alpha=alpha, beta=beta,
                     interpret=interpret, meta=self.meta)

    def mm(self, X, Y_in=None, alpha=1.0, beta=0.0, interpret: bool = False):
        from merge_spmv_tpu.ops.csrmv import csrmm
        return csrmm(self.plan, self.values, self.row_end_offsets,
                     self.col_indices, X, Y_in=Y_in, alpha=alpha, beta=beta,
                     interpret=interpret, meta=self.meta)

    def describe(self) -> str:
        return self.plan.describe()


def build_operator(csr, dtype="float32", backend: str = "auto",
                   tile_items: Optional[int] = None) -> SpmvOperator:
    """Build the operator from a host CsrMatrix (formats/csr.py).

    Computes the gather plan on the host (one pass over col_indices) and
    uploads everything once.
    """
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.gather_plan import (gather_meta_np,
                                                pack_tile_meta_np)
    from merge_spmv_tpu.ops.merge_path import merge_tile_coordinates_np

    plan = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                     dtype=dtype, tile_items=tile_items, backend=backend,
                     row_end_offsets=csr.row_offsets[1:],
                     col_indices=csr.col_indices)
    values, rowends, cols = csr.to_device(dtype=plan.dtype)
    meta = None
    if plan.backend in ("pallas", "pallas_ds") and plan.meta_k:
        bpt = (plan.tile_items + 1024) // 1024 + 1
        cnt, lst = gather_meta_np(csr.col_indices, csr.num_nonzeros,
                                  pad_blocks=bpt,
                                  shift=10 if plan.meta_gran == 1024 else 7)
        assert lst.shape[1] == plan.meta_k
        _, tile_nnz = merge_tile_coordinates_np(
            csr.row_offsets[1:], csr.num_nonzeros, plan.tile_items)
        meta = jnp.asarray(pack_tile_meta_np(cnt, lst, tile_nnz,
                                             plan.tile_items))
        if plan.x_win:
            from merge_spmv_tpu.ops.gather_plan import tile_col_meta_np
            cbase, _ = tile_col_meta_np(csr.col_indices, csr.num_nonzeros,
                                        csr.row_offsets[1:],
                                        plan.tile_items)
            meta = (meta, jnp.asarray(cbase))
    return SpmvOperator(plan, values, rowends, cols, meta=meta)
