"""ctypes bindings for the native host library (native/market_io.cpp).

Provides the C++ fast paths for the data layer:

* ``read_market`` — Matrix Market parser (reference parity with
  CooMatrix::InitMarket, sparse_matrix.h:217-380),
* ``coo_to_csr`` — stable (row, col) sort + row-offset build with
  empty-row backfill (CsrMatrix::Init, sparse_matrix.h:666-728).

The library is built lazily with g++ on first use (native/Makefile) and
cached under native/build/.  Every entry point has a pure-NumPy fallback in
formats/market.py and formats/csr.py, so the framework works without a
toolchain; the native paths exist because ingest is the dominant cost of
corpus sweeps (the reference's strtod loop is its I/O hot path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmerge_spmv_host.so")


def _build():
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                   capture_output=True, timeout=300)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_LIB_PATH):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.SubprocessError):
            return None
        c_i64 = ctypes.c_int64
        c_p = ctypes.c_void_p
        lib.msp_read_market.restype = c_p
        lib.msp_read_market.argtypes = [ctypes.c_char_p, ctypes.c_double]
        lib.msp_coo_num_rows.restype = c_i64
        lib.msp_coo_num_rows.argtypes = [c_p]
        lib.msp_coo_num_cols.restype = c_i64
        lib.msp_coo_num_cols.argtypes = [c_p]
        lib.msp_coo_nnz.restype = c_i64
        lib.msp_coo_nnz.argtypes = [c_p]
        lib.msp_coo_error.restype = ctypes.c_char_p
        lib.msp_coo_error.argtypes = [c_p]
        lib.msp_coo_copy.restype = None
        lib.msp_coo_copy.argtypes = [c_p, c_p, c_p, c_p]
        lib.msp_coo_free.restype = None
        lib.msp_coo_free.argtypes = [c_p]
        lib.msp_coo_to_csr.restype = None
        lib.msp_coo_to_csr.argtypes = [c_i64, c_i64, c_p, c_p, c_p,
                                       c_p, c_p, c_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def read_market(path: str, default_value: float = 1.0,
                value_dtype=np.float64):
    """Parse a .mtx file via the native library.

    Returns (num_rows, num_cols, rows, cols, vals).
    """
    lib = _load()
    if lib is None:
        raise ImportError("native host library unavailable")
    handle = lib.msp_read_market(path.encode(), float(default_value))
    try:
        err = lib.msp_coo_error(handle)
        if err:
            raise ValueError(f"MARKET parse error: {err.decode()}")
        nr = lib.msp_coo_num_rows(handle)
        nc = lib.msp_coo_num_cols(handle)
        nnz = lib.msp_coo_nnz(handle)
        rows = np.empty(nnz, dtype=np.int32)
        cols = np.empty(nnz, dtype=np.int32)
        vals = np.empty(nnz, dtype=np.float64)
        lib.msp_coo_copy(handle,
                         rows.ctypes.data_as(ctypes.c_void_p),
                         cols.ctypes.data_as(ctypes.c_void_p),
                         vals.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.msp_coo_free(handle)
    if np.dtype(value_dtype) != np.float64:
        vals = vals.astype(value_dtype)
    return int(nr), int(nc), rows, cols, vals


def coo_to_csr(num_rows: int, rows, cols, vals):
    """Native COO→CSR: returns (row_offsets, cols_sorted, vals_sorted).

    Stable (row, col) order; duplicates retained; empty rows backfilled
    (sparse_matrix.h:666-728 semantics).
    """
    lib = _load()
    if lib is None:
        raise ImportError("native host library unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals64 = np.ascontiguousarray(vals, dtype=np.float64)
    nnz = len(vals64)
    row_offsets = np.empty(num_rows + 1, dtype=np.int32)
    out_cols = np.empty(nnz, dtype=np.int32)
    out_vals = np.empty(nnz, dtype=np.float64)
    lib.msp_coo_to_csr(nnz, int(num_rows),
                       rows.ctypes.data_as(ctypes.c_void_p),
                       cols.ctypes.data_as(ctypes.c_void_p),
                       vals64.ctypes.data_as(ctypes.c_void_p),
                       row_offsets.ctypes.data_as(ctypes.c_void_p),
                       out_cols.ctypes.data_as(ctypes.c_void_p),
                       out_vals.ctypes.data_as(ctypes.c_void_p))
    out_vals_cast = out_vals
    if np.asarray(vals).dtype != np.float64:
        out_vals_cast = out_vals.astype(np.asarray(vals).dtype)
    return row_offsets, out_cols, out_vals_cast
