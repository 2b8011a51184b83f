"""Tuning-ladder mechanics: shape-class bucketing + cache round trip."""

import json

import numpy as np

from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops import autotune


def test_shape_class_buckets():
    a = autotune.shape_class(1_000_000, 6_000_000, 128, 11, "float32")
    b = autotune.shape_class(1_040_000, 6_300_000, 128, 11, "float32")
    c = autotune.shape_class(1_000_000, 6_000_000, 1024, 0, "float32")
    assert a == b            # same class: same policy
    assert a != c            # gather mode splits the class


def test_cache_round_trip(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "tune.json"))
    autotune._store("k1", {"tile_items": 32768})
    assert autotune._load_cache()["k1"]["tile_items"] == 32768
    # corrupt file degrades to empty, not a crash
    (tmp_path / "tune.json").write_text("{broken")
    assert autotune._load_cache() == {}


def test_autotune_short_circuits_off_tpu(tmp_path, monkeypatch):
    """On a non-TPU backend the tuner returns the plan default without
    sweeping (no device timing on CPU CI)."""
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "tune.json"))
    csr = CsrMatrix.from_coo(CooMatrix.grid2d(20)).astype(np.float32)
    t = autotune.autotune_tile_items(csr)
    assert t >= 1024
    assert autotune._load_cache() == {}   # nothing was swept/stored


def test_build_operator_accepts_autotune_flag():
    from merge_spmv_tpu.ops.operator import build_operator
    csr = CsrMatrix.from_coo(CooMatrix.grid2d(16)).astype(np.float32)
    op = build_operator(csr, autotune=True)
    assert op.plan.tile_items >= 1024
