"""Device compute path: merge-path decomposition, CsrMV/CsrMM kernels.

Layering (TPU re-design of reference L0-L4, see SURVEY.md §1):

* merge_path.py — the 2D merge-path diagonal search, host + device
  (reference: cpu_spmv.cpp:223-245, cub/thread/thread_search.cuh:53-84).
* plan.py — two-phase plan contract: tile counts, policy selection
  (reference: DispatchSpmv tuning policies + temp-storage planning,
  cub/device/dispatch/dispatch_spmv_orig.cuh:262-445, 608-655).
* csrmv_xla.py — segment-sum formulation compiled by XLA; the device golden
  model and universal fallback.
* csrmv_pallas.py — the merge-path Pallas kernel: fixed-VMEM merge tiles,
  in-tile segmented reduction, carry fix-up.
* csrmv.py — public API dispatch (reference: DeviceSpmv::CsrMV,
  cub/device/device_spmv.cuh:129-164).
* gather_plan.py — per-matrix gather metadata (distinct column-window
  lists per 1024-nnz block; the TPU answer to hardware x-gather).
* operator.py — SpmvOperator: device-resident matrix + plan + metadata.
"""

from merge_spmv_tpu.ops.merge_path import merge_path_search, merge_tile_coordinates
from merge_spmv_tpu.ops.plan import SpmvPlan, make_plan
from merge_spmv_tpu.ops.csrmv import csrmv, csrmm
from merge_spmv_tpu.ops.operator import SpmvOperator, build_operator

__all__ = ["merge_path_search", "merge_tile_coordinates",
           "SpmvPlan", "make_plan", "csrmv", "csrmm",
           "SpmvOperator", "build_operator"]
