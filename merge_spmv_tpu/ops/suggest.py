"""Structure probe: which operator should a user build for this matrix?

The default contract is the reference's — no preprocessing, merge-path
CsrMV for everything (README.md:5-7).  But the framework also ships
three documented opt-in splits that trade one-time setup for per-call
speed (the reference reports the same trade for cuSPARSE HybMV,
gpu_spmv.cu:114-134):

* DIA        — dense diagonals (stencil/banded-exact classes), ops/dia.py
* hot/cold   — power-law column popularity (kron/webbase), ops/split.py
* banded     — wide diagonal-local scatter (circuit class), ops/split.py

``suggest_backend`` runs the cheap host-side structure probes (three
histogram passes over col_indices, no device work) and names the
operator whose win condition the matrix matches; ``build_suggested``
builds it.  Purely advisory — the suggestion is a starting point, the
autotuner and the benchmarks decide.
"""

from __future__ import annotations

import numpy as np

from merge_spmv_tpu.formats.csr import CsrMatrix

__all__ = ["suggest_backend", "build_suggested"]


def suggest_backend(csr: CsrMatrix) -> dict:
    """Probe structure, return {"backend", "why", ...probe stats}.

    Decision ladder (first match wins):
      1. ≥90 % of nonzeros on ≤32 dense diagonals        → "dia"
      2. popularity split selects a hot set               → "hotcold"
      3. 90th-percentile |col−row| beyond 32K columns     → "split"
      4. otherwise                                        → "merge"
    """
    from merge_spmv_tpu.ops.dia import diagonal_assignment
    from merge_spmv_tpu.ops.split import _row_ids, popularity_assignment

    row_ids = _row_ids(csr)
    offsets, dmask = diagonal_assignment(csr, min_coverage=0.9,
                                         row_ids=row_ids)
    if offsets.size:
        cov = float(dmask.mean())
        return {"backend": "dia", "diagonals": int(offsets.size),
                "coverage": round(cov, 3),
                "why": f"{offsets.size} dense diagonals hold "
                       f"{100 * cov:.0f}% of the nonzeros"}
    hot_mask, hot_windows = popularity_assignment(csr)
    # a marginal hot set (popularity_assignment's own floor is 10 %)
    # doesn't justify the second launch — recommend only when the hot
    # side carries a meaningful share of the work
    if hot_windows.size and float(hot_mask.mean()) >= 0.3:
        cov = float(hot_mask.mean())
        return {"backend": "hotcold", "hot_windows": int(hot_windows.size),
                "coverage": round(cov, 3),
                "why": f"{hot_windows.size} popular column windows hold "
                       f"{100 * cov:.0f}% of the nonzeros"}
    if csr.num_nonzeros:
        d = np.abs(csr.col_indices.astype(np.int64, copy=False) - row_ids)
        spread = int(np.quantile(d, 0.9))
        if spread > 32 * 1024:
            return {"backend": "split", "p90_distance": spread,
                    "why": f"90th-percentile column distance {spread} "
                           "spans the streaming-x budget"}
    return {"backend": "merge",
            "why": "no split precondition holds; the no-preprocessing "
                   "merge path is the right default"}


def build_suggested(csr: CsrMatrix, dtype="float32", **kwargs):
    """Build the operator ``suggest_backend`` names.

    ``kwargs`` are forwarded to whichever builder the probe picks, but
    only those its signature accepts — the caller cannot know the
    backend in advance (that is this function's whole point), so a
    tuning kwarg for one backend must not crash another.
    """
    import inspect

    rec = suggest_backend(csr)
    b = rec["backend"]
    if b == "dia":
        from merge_spmv_tpu.ops.dia import build_dia_operator as builder
        extra = {}
    elif b == "hotcold":
        from merge_spmv_tpu.ops.split import (
            build_hotcold_operator as builder)
        extra = {}
    elif b == "split":
        from merge_spmv_tpu.ops.split import (
            build_split_operator as builder)
        extra = {"edges_chunks": "quantile"}
    else:
        from merge_spmv_tpu.ops.operator import build_operator as builder
        extra = {}
    accepted = set(inspect.signature(builder).parameters)
    kw = {k: v for k, v in kwargs.items() if k in accepted}
    return builder(csr, dtype=dtype, **extra, **kw), rec
