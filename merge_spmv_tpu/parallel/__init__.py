"""Multi-chip / multi-host execution: global merge-path partitioning over a
`jax.sharding.Mesh` with `shard_map` + XLA collectives.

The reference has no distributed backend (SURVEY.md §2.4); its paper claims
the merge decomposition "applies recursively across distributed memories".
This package realizes that claim TPU-natively: the same diagonal binary
search that splits tiles inside a chip splits the global (rows, nnz) merge
path into per-chip shares, cross-chip row carries are resolved with one
tiny collective (the SPMD analog of the OMP driver's serial carry fix-up,
cpu_spmv.cpp:347-353), and x is made visible to every shard via all-gather
over ICI.
"""

from merge_spmv_tpu.parallel.partition import MergePartition, partition_csr
from merge_spmv_tpu.parallel.distributed import (distributed_csrmv,
                                                 distributed_csrmv_fn)

__all__ = ["MergePartition", "partition_csr", "distributed_csrmv",
           "distributed_csrmv_fn"]
