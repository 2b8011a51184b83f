"""The comparator must stay meaningful at benchmark sizes.

The raw reference rule (sqrt(int32_bit_diff) > len, utils.h:693-742) goes
vacuous once len exceeds ~46K — sqrt of the max possible fp32 bit distance —
so a 1M-row verify could never fail.  utils/compare.py caps the length term
(ULP_LEN_CAP); these tests pin that a corrupted kernel output FAILS at 1M
elements while legitimate reduction-order noise still passes.
"""

import numpy as np

from merge_spmv_tpu.utils.compare import (ULP_LEN_CAP, compare_results,
                                          max_ulp_distance, ulp_distance)


def test_corrupted_output_fails_at_1m():
    n = 1_000_000
    good = np.zeros(n, np.float32)
    bad = np.full(n, 6.0, np.float32)
    assert compare_results(bad, good, verbose=False) is not None


def test_single_corrupt_element_fails_at_1m():
    n = 1_000_000
    ref = np.linspace(1.0, 2.0, n).astype(np.float32)
    got = ref.copy()
    got[123_456] *= 1.5
    assert compare_results(got, ref, verbose=False) == 123_456


def test_nan_fails():
    ref = np.ones(100_000, np.float32)
    got = ref.copy()
    got[7] = np.nan
    assert compare_results(got, ref, verbose=False) == 7


def test_reduction_order_noise_passes_at_1m():
    n = 1_000_000
    rs = np.random.RandomState(0)
    ref = rs.uniform(0.5, 1.5, n).astype(np.float32)
    # a few hundred ULPs of noise — typical parallel-reduction divergence
    got = (ref.astype(np.float64) * (1 + rs.uniform(-3e-6, 3e-6, n))
           ).astype(np.float32)
    assert max_ulp_distance(got, ref) > 0      # noise is real
    assert compare_results(got, ref, verbose=False) is None


def test_relative_escape_hatch():
    # huge-magnitude values whose ULP spacing is coarse: a tiny relative
    # error can be many ULPs — the rel-tol escape keeps these passing
    ref = np.full(10, 1e30, np.float32)
    got = (ref.astype(np.float64) * (1 + 5e-5)).astype(np.float32)
    assert compare_results(got, ref, verbose=False) is None


def test_small_vectors_use_reference_rule():
    # below the cap the behavior is the reference's: sqrt(ulp) > n fails
    ref = np.array([1.0, 2.0], np.float32)
    got = np.array([1.0, 2.5], np.float32)
    assert compare_results(got, ref, verbose=False) == 1
    near = np.array([1.0, np.nextafter(np.float32(2.0), np.float32(3))],
                    np.float32)
    assert compare_results(near, ref, verbose=False) is None


def test_int_compare_exact():
    a = np.array([1, 2, 3], np.int32)
    b = np.array([1, 2, 4], np.int32)
    assert compare_results(a, b, verbose=False) == 2
    assert compare_results(a, a.copy(), verbose=False) is None


def test_ulp_distance_symmetry():
    a = np.array([1.0], np.float32)
    b = np.array([1.0000001], np.float32)
    assert (ulp_distance(a, b) == ulp_distance(b, a)).all()
    assert ULP_LEN_CAP < 46_000   # stays below the vacuity horizon


def test_prefix_bound_covers_cumsum_difference_rounding():
    """A tiny single-nonzero row inside a block whose signed running
    prefix is large can only be recovered to ~eps*|prefix| by a
    prefix-difference kernel (the webbase-class chip failure, round 4).
    spmv_abs_bound's segmented_block term must cover that error, while a
    genuinely corrupted value must still fail."""
    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix

    rs = np.random.RandomState(7)
    n = 4096
    # rows 0..n-2: degree-1 rows with large signed values (the prefix
    # random-walks to ~sqrt(k) * 0.5); one tiny row in the middle
    rows = np.arange(n, dtype=np.int64)
    cols = rs.randint(0, n, n)
    vals = rs.uniform(-1.0, 1.0, n)
    tiny = 2000
    vals[tiny] = 1.5e-5
    csr = CsrMatrix.from_coo(CooMatrix(n, n, rows, cols, vals)
                             ).astype(np.float32)
    x = np.ones(n, np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)
    bound_classic = csr.spmv_abs_bound(x, segmented_block=0)

    # emulate the kernel's block-local fp32 prefix difference for the row
    p = (csr.values * x[csr.col_indices]).astype(np.float32)
    s = int(csr.row_offsets[tiny])
    b0 = (s // 1024) * 1024
    cs = np.cumsum(p[b0:b0 + 1024], dtype=np.float32)
    emulated = cs[s - b0] - (cs[s - b0 - 1] if s > b0 else np.float32(0))
    got = gold.copy()
    got[tiny] = emulated
    if compare_results(got, gold, verbose=False,
                       abs_bound=bound_classic) is None:
        # prefix happened to be small at this seed: force a 1-ULP(prefix)
        # error so the test pins the mechanism regardless
        got[tiny] = gold[tiny] + np.float32(np.abs(cs).max()) * np.float32(
            1.2e-7) * 4
    assert compare_results(got, gold, verbose=False,
                           abs_bound=bound) is None

    corrupt = gold.copy()
    corrupt[tiny] = 0.5
    assert compare_results(corrupt, gold, verbose=False,
                           abs_bound=bound) is not None
