"""Benchmark CLI / driver end-to-end tests (CPU backends).

Mirrors the reference driver flow (cpu_spmv.cpp:537-675): build matrix →
stats → gold → verify → time → perf line, in both human and --quiet CSV
modes, including rectangular matrices (num_rows != num_cols).
"""

import io
import contextlib

import numpy as np
import pytest

import spmv_cli
from merge_spmv_tpu.bench.driver import run_benchmark


def _run(args):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        results = run_benchmark(args)
    return results, out.getvalue()


def test_driver_grid2d_quiet_csv():
    results, text = _run({"grid2d": 30, "fp32": True, "quiet": True,
                          "backends": ["scipy", "xla"], "i": 5})
    assert "scipy" in results and "xla" in results
    assert results["xla"]["verified"]
    # CSV fragments: stats then per-backend numbers, comma separated
    assert text.count(",") > 10 and "PASS" not in text


def test_driver_rectangular_matrix():
    from merge_spmv_tpu.formats.coo import CooMatrix
    import tempfile, os

    coo = CooMatrix.random_powerlaw(150, 120, 900, seed=3)
    with tempfile.NamedTemporaryFile(suffix=".mtx", delete=False) as f:
        path = f.name
    coo.to_market(path)
    try:
        results, _ = _run({"mtx": path, "fp32": True, "quiet": True,
                           "backends": ["xla"], "i": 5})
    finally:
        os.unlink(path)
    assert results["xla"]["verified"]
    assert results["xla"]["avg_ms"] > 0


def test_driver_wheel_verbose():
    results, text = _run({"wheel": 200, "fp32": True,
                          "backends": ["scipy"], "i": 5})
    assert "PASS" in text and "gflops" in text
    assert results["scipy"]["verified"]


def test_cli_arg_parsing():
    args = spmv_cli.parse_args(["prog", "--grid3d=12", "--fp64",
                                "--backends=xla,merge", "--alpha=2.5",
                                "--quiet"])
    assert args["grid3d"] == 12 and args["fp32"] is False
    assert args["backends"] == ["xla", "merge"]
    assert args["alpha"] == 2.5 and args["quiet"] is True
