"""Tile-size autotuner with a persistent cache — the runtime analog of the
reference's per-SM compile-time policy ladder (dispatch_spmv_orig.cuh:262-445).

The reference bakes TILE_ITEMS-equivalents into per-architecture template
policies; on TPU the policy space is one knob (merge items per grid step)
whose optimum depends on the matrix *shape class*, not just the chip.  The
tuner times real candidates once per shape class and caches the winner:

    op = build_operator(csr, autotune=True)      # sweeps on first sight

Shape classes bucket (log2 rows, log2 nnz/row, gather mode) — matrices in
the same bucket share a policy, so the sweep cost (a few compiles) is paid
once per class per cache file, mirroring how one reference policy serves
every matrix on a given SM.
"""

from __future__ import annotations

import json
import math
import os
import threading

__all__ = ["autotune_plan", "autotune_tile_items", "shape_class",
           "DEFAULT_CANDIDATES"]

DEFAULT_CANDIDATES = (32768, 65536, 131072)

_CACHE_PATH = os.environ.get(
    "MERGE_SPMV_TUNE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".tune_cache.json"))
_LOCK = threading.Lock()


def shape_class(num_rows: int, num_nonzeros: int, meta_gran: int,
                meta_k: int, dtype: str) -> str:
    """Bucket key: matrices in one class share a tile policy."""
    lr = int(math.log2(max(num_rows, 1)))
    deg = max(1, num_nonzeros // max(num_rows, 1))
    ld = int(math.log2(deg))
    mode = f"g{meta_gran}k{min(meta_k, 16)}" if meta_k else "range"
    return f"r{lr}_d{ld}_{mode}_{dtype}"


def _load_cache() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store(key: str, entry: dict):
    with _LOCK:
        cache = _load_cache()
        cache[key] = entry
        tmp = _CACHE_PATH + ".tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(cache, f, indent=1)
            os.replace(tmp, _CACHE_PATH)
        except OSError:
            pass


def _time_operator(csr, dtype, tile_items, runtime_skip=None,
                   gather_group=1, gather_cluster=False, n=12, reps=3):
    """Chained-dependent timing (tunnel-safe; see utils/timers)."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.ops.operator import build_operator

    op = build_operator(csr, dtype=dtype, tile_items=tile_items,
                        runtime_skip=runtime_skip,
                        gather_group=gather_group,
                        gather_cluster=gather_cluster)
    x0 = jnp.ones((csr.num_cols,), jnp.float32)
    ncols = csr.num_cols

    def step(xc):
        y = op(xc)
        if csr.num_rows >= ncols:
            return xc + y[:ncols].astype(xc.dtype) * 1e-20
        return xc + jnp.pad(y, (0, ncols - csr.num_rows)
                            ).astype(xc.dtype) * 1e-20

    step = jax.jit(step)
    xc = x0
    for _ in range(3):
        xc = step(xc)
    _ = np.asarray(xc[:1])
    best = 1e30
    for _ in range(reps):
        xc = x0
        t0 = time.perf_counter()
        for _ in range(n):
            xc = step(xc)
        _ = np.asarray(xc[:1])
        big = time.perf_counter() - t0
        xc = x0
        t0 = time.perf_counter()
        xc = step(xc)
        _ = np.asarray(xc[:1])
        one = time.perf_counter() - t0
        best = min(best, max(big - one, 1e-9) / (n - 1))
    return best * 1e3


def autotune_plan(csr, dtype="float32", candidates=DEFAULT_CANDIDATES,
                  verbose: bool = False) -> dict:
    """Best knob TUPLE for this matrix's shape class (cached).

    Sweeps tile_items x runtime_skip x gather_group (branch boundaries
    cost ~2x on uniform shapes while skipping wins on skewed ones; group
    visits amortize the dominant per-visit fetch on column-local shapes,
    NOTES.md).  The heuristic's own choice is timed first and
    alternatives must beat it; the cache entry carries the full tuple,
    the analog of one reference policy line
    (dispatch_spmv_orig.cuh:262-445).

    Returns {"tile_items": int, "runtime_skip": bool | None,
    "gather_group": int}.
    """
    from merge_spmv_tpu.ops.plan import make_plan

    probe = make_plan(csr.num_rows, csr.num_cols, csr.num_nonzeros,
                      dtype=dtype, row_end_offsets=csr.row_offsets[1:],
                      col_indices=csr.col_indices)
    key = shape_class(csr.num_rows, csr.num_nonzeros, probe.meta_gran,
                      probe.meta_k, probe.dtype)
    cached = _load_cache().get(key)
    if cached:
        return {"tile_items": int(cached["tile_items"]),
                "runtime_skip": cached.get("runtime_skip"),
                "gather_group": int(cached.get("gather_group", 1)),
                "gather_cluster": bool(cached.get("gather_cluster", False))}
    default = {"tile_items": probe.tile_items, "runtime_skip": None,
               "gather_group": 1, "gather_cluster": False}
    if probe.backend not in ("pallas", "pallas_ds"):
        return default

    results = {}
    for cand in candidates:
        for rskip in (None, not probe.runtime_skip):
            # None = the heuristic's choice; the flip is only swept at
            # the heuristic's own tile size (keeps the sweep at N+1
            # compiles instead of 2N)
            if rskip is not None and cand != probe.tile_items:
                continue
            try:
                ms = _time_operator(csr, dtype, cand, runtime_skip=rskip)
                results[(cand, rskip, 1, False)] = ms
                if verbose:
                    print(f"  autotune {key}: T={cand} skip={rskip}: "
                          f"{ms:.4f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 — may not fit VMEM
                if verbose:
                    print(f"  autotune {key}: T={cand} skip={rskip} "
                          f"failed: {e}", flush=True)
    # group-gather candidates at the heuristic tile size (fine-list
    # non-skip plans only; the plan demotes the knob when not viable)
    if probe.meta_k and probe.meta_gran == 128 and not probe.runtime_skip:
        for g in (4, 8):
            try:
                ms = _time_operator(csr, dtype, probe.tile_items,
                                    gather_group=g)
                results[(probe.tile_items, None, g, False)] = ms
                if verbose:
                    print(f"  autotune {key}: T={probe.tile_items} "
                          f"G={g}: {ms:.4f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                if verbose:
                    print(f"  autotune {key}: G={g} failed: {e}",
                          flush=True)
    # cluster-gather candidate at the heuristic tile size (same
    # viability window; the plan demotes the knob when the cover fails)
    if probe.meta_k and probe.meta_gran == 128 and not probe.runtime_skip \
            and probe.x_in_vmem:
        try:
            ms = _time_operator(csr, dtype, probe.tile_items,
                                gather_cluster=True)
            results[(probe.tile_items, False, 1, True)] = ms
            if verbose:
                print(f"  autotune {key}: T={probe.tile_items} "
                      f"cluster: {ms:.4f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            if verbose:
                print(f"  autotune {key}: cluster failed: {e}", flush=True)
    if not results:
        return default
    best = min(results, key=results.get)
    entry = {"tile_items": int(best[0]), "runtime_skip": best[1],
             "gather_group": int(best[2]), "gather_cluster": bool(best[3]),
             "ms": {f"T{c}_skip{r}_G{g}_C{int(cl)}": round(v, 4)
                    for (c, r, g, cl), v in results.items()}}
    _store(key, entry)
    return {"tile_items": int(best[0]), "runtime_skip": best[1],
            "gather_group": int(best[2]), "gather_cluster": bool(best[3])}


def autotune_tile_items(csr, dtype="float32",
                        candidates=DEFAULT_CANDIDATES,
                        verbose: bool = False) -> int:
    """Back-compat wrapper: tile_items from the tuple tuner."""
    return autotune_plan(csr, dtype=dtype, candidates=candidates,
                         verbose=verbose)["tile_items"]
