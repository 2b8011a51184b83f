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
                                "--beta=-0.5", "--quiet"])
    assert args["grid3d"] == 12 and args["fp32"] is False
    assert args["backends"] == ["xla", "merge"]
    assert args["alpha"] == 2.5 and args["beta"] == -0.5
    assert args["quiet"] is True


def test_driver_beta_epilogue():
    # --beta exercises y = alpha*A*x + beta*y_in end to end (VERDICT
    # missing #6): gold and backends must agree with the epilogue applied
    results, _ = _run({"grid2d": 20, "fp32": True, "quiet": True,
                       "backends": ["scipy", "xla"], "i": 3,
                       "alpha": 1.5, "beta": -0.5})
    assert results["scipy"]["verified"]
    assert results["xla"]["verified"]


def test_driver_merge_resolves_through_auto(monkeypatch):
    """The 'merge' backend must resolve via backend='auto' so fp64 routes
    to pallas_ds instead of silently timing the fp32 kernel
    (bench/driver.py round-1 bug; ADVICE.md medium)."""
    from merge_spmv_tpu.ops import operator as op_mod

    seen = {}
    real = op_mod.build_operator

    def spy(csr, dtype="float32", backend="auto", tile_items=None,
            **kw):
        seen["backend"] = backend
        return real(csr, dtype=dtype, backend=backend,
                    tile_items=tile_items, **kw)

    monkeypatch.setattr(op_mod, "build_operator", spy)
    results, _ = _run({"grid2d": 16, "fp32": True, "quiet": True,
                       "backends": ["merge"], "i": 3})
    assert seen["backend"] == "auto"
    assert results["merge"]["verified"]


def test_fp64_auto_routes_to_pallas_ds(monkeypatch):
    """On a TPU platform, auto + float64 must pick the double-single
    pallas route (plan policy), which the driver now reaches."""
    import jax

    from merge_spmv_tpu.ops.plan import make_plan

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan = make_plan(100, 100, 700, dtype=np.float64, backend="auto")
    assert plan.backend == "pallas_ds"
    plan32 = make_plan(100, 100, 700, dtype=np.float32, backend="auto")
    assert plan32.backend == "pallas"


def test_cli_split_backend_runs():
    """--backends=split drives the stacked banded operator end to end."""
    results, _ = _run({"uniform": 600, "fp32": True, "quiet": True,
                       "backends": ["split"], "split": 3, "i": 3})
    assert results["split"]["verified"]


def test_cli_dia_backend_runs():
    """--backends=dia drives the diagonal split end to end; grid2d is
    pure stencil so the whole multiply is the D-shifted-FMA path."""
    results, _ = _run({"grid2d": 60, "fp32": True, "quiet": True,
                       "backends": ["dia"], "i": 3})
    assert results["dia"]["verified"]


def test_cli_hotcold_backend_runs():
    """--backends=hotcold drives the popularity split end to end.  The
    generator's columns are uniform so the hot set declines and the
    operator degenerates to a single cold launch — the declining path is
    exactly what the driver must survive."""
    results, _ = _run({"powerlaw": 4000, "fp32": True, "quiet": True,
                       "backends": ["hotcold"], "i": 3})
    assert results["hotcold"]["verified"]
