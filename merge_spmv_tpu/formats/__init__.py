"""Host-side sparse-matrix data layer: COO/CSR containers, Matrix Market
ingest, synthetic generators and graph statistics.

Reproduces the capabilities of the reference data layer
(/root/reference/sparse_matrix.h) with vectorized NumPy on the host and an
optional C++ fast path (native/market_io.cpp) for large .mtx files.
"""

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.formats.stats import GraphStats

__all__ = ["CooMatrix", "CsrMatrix", "GraphStats"]
