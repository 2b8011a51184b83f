"""Length-scaled ULP result comparison (parity: utils.h:672-808).

The reference tolerance model reinterprets each float as its int32 bit
pattern and fails when ``sqrt(|int_a - int_b|) > len`` — i.e. the allowed ULP
distance grows with the square of the vector length, absorbing
reduction-order differences between parallel backends and the sequential
gold.  fp64 results are deliberately verified only to fp32 ULP distance
(utils.h:726-728): both operands are downcast to float32 first.  Integer and
other dtypes compare exactly (utils.h:672-686).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ulp_distance", "compare_results", "max_ulp_distance"]


def ulp_distance(computed, reference):
    """Per-element ULP distance after downcast to float32."""
    a = np.asarray(computed, dtype=np.float32).view(np.int32).astype(np.int64)
    b = np.asarray(reference, dtype=np.float32).view(np.int32).astype(np.int64)
    return np.abs(a - b)


def max_ulp_distance(computed, reference) -> int:
    d = ulp_distance(computed, reference)
    return int(d.max()) if d.size else 0


def compare_results(computed, reference, verbose: bool = True):
    """Returns None if equivalent, else the index of the first failure.

    Float/double inputs use the length-scaled ULP rule
    (``sqrt(int_diff) > len`` fails); everything else compares exactly.
    """
    computed = np.asarray(computed)
    reference = np.asarray(reference)
    if computed.shape != reference.shape:
        raise ValueError(f"shape mismatch: {computed.shape} vs {reference.shape}")
    n = computed.size
    if computed.dtype.kind == "f" or reference.dtype.kind == "f":
        int_diff = ulp_distance(computed.ravel(), reference.ravel())
        bad = np.sqrt(int_diff.astype(np.float64)) > n
    else:
        bad = computed.ravel() != reference.ravel()
    if not bad.any():
        return None
    idx = int(np.argmax(bad))
    if verbose:
        print(f"INCORRECT: [{idx}]: {computed.ravel()[idx]!r} != "
              f"{reference.ravel()[idx]!r}")
    return idx


def assert_allclose_ulp(computed, reference, context: str = ""):
    """Assertion wrapper for tests: raises with diagnostics on mismatch."""
    idx = compare_results(computed, reference, verbose=False)
    if idx is not None:
        c = np.asarray(computed).ravel()
        r = np.asarray(reference).ravel()
        d = ulp_distance(c, r)
        raise AssertionError(
            f"{context} mismatch at [{idx}]: computed={c[idx]!r} "
            f"reference={r[idx]!r} ulp={d[idx]} max_ulp={d.max()} "
            f"threshold=sqrt(ulp)<={c.size}")
