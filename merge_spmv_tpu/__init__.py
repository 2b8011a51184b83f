"""merge_spmv_tpu — a TPU-native merge-path sparse linear-algebra framework.

A from-scratch re-design (JAX / Pallas / shard_map) of the capabilities of the
merge-based CsrMV research artifact (Merrill & Garland, SC'16; reference layout
surveyed in SURVEY.md).  The compute path is idiomatic TPU:

* the 2D merge-path decomposition becomes a Pallas kernel over a grid of
  fixed-VMEM-footprint merge tiles (ops/csrmv_pallas.py),
* the reduce-value-by-key carry-out fix-up collapses into a sequential-grid
  carry (single core) or a tiny XLA segment-sum (parallel tiles),
* multi-chip row/nnz partitioning is a global merge-path search feeding
  `jax.shard_map` over a device mesh with all-gather / psum collectives
  (parallel/),
* host tooling (Matrix Market ingest, generators, graph statistics, benchmark
  harness) lives in formats/, utils/ and bench/ with an optional C++ fast
  ingest path (native/).

Public API mirrors the reference two-phase contract
(cub/device/device_spmv.cuh:129-164): build a plan once, run many times.
"""

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.formats.stats import GraphStats
from merge_spmv_tpu.ops.plan import SpmvPlan, make_plan
from merge_spmv_tpu.ops.csrmv import csrmv, csrmm
from merge_spmv_tpu.ops.operator import SpmvOperator, build_operator
from merge_spmv_tpu.ops.merge_path import merge_path_search, merge_tile_coordinates
from merge_spmv_tpu.ops.dia import build_dia_operator
from merge_spmv_tpu.ops.split import (build_hotcold_operator,
                                      build_split_operator,
                                      build_split_operator_device)
from merge_spmv_tpu.ops.suggest import build_suggested, suggest_backend

__version__ = "0.3.0"

__all__ = [
    "CooMatrix",
    "CsrMatrix",
    "GraphStats",
    "SpmvPlan",
    "SpmvOperator",
    "build_operator",
    "build_dia_operator",
    "build_hotcold_operator",
    "build_split_operator",
    "build_split_operator_device",
    "build_suggested",
    "suggest_backend",
    "make_plan",
    "csrmv",
    "csrmm",
    "merge_path_search",
    "merge_tile_coordinates",
]
