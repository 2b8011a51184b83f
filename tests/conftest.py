"""Test configuration.

Tests run on a simulated 8-device CPU mesh so multi-chip sharding logic is
exercised without a pod (SURVEY.md §4).  Set MERGE_SPMV_TEST_TPU=1 to run the
suite against real TPU devices instead.
"""

import os

if not os.environ.get("MERGE_SPMV_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"   # override any preset accelerator
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # jax may already be imported by a sitecustomize hook that snapshots
    # the env — override through the config API as well.
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Interpret-mode-heavy tests (each >5 s on the 1-core CI host).  The fast
# suite (`pytest -m "not slow"`) stays under ~2 minutes so every session can
# run it whole; `pytest tests/` still runs everything.  Names are matched
# against the test id's function part (parametrized ids match by prefix).
_SLOW_TESTS = {
    "test_ds_long_row_error_bound_interpret",
    "test_fp64_double_single_route",
    "test_x_window_streaming",
    "test_operator_prepared_path_matches_raw",
    "test_gather_cluster_operator_matches_gold",
    "test_larger_tile_items",
    "test_csrmm_pallas_vs_gold",
    "test_distributed_pallas_local_backend",
    "test_prepared_distributed_csrmv",
    "test_tile_boundary_exact_row_end",
    "test_gather_cluster_skip_path_matches_gold",
    "test_gather_group_streamed_x",
    "test_dlist_mode_vs_gold",
    "test_fused_ds_operator_fine_and_coarse",
}


# Parametrized cases individually >4 s whose family must keep SOME fast
# coverage: the named ids go slow, the small ids stay fast.
_SLOW_IDS = {
    "test_pallas_vs_gold[grid2d]",
    "test_pallas_vs_gold[dense_rows]",
    "test_pallas_vs_gold[wheel_hub_spans_tiles]",
    "test_pallas_vs_gold[leading_trailing_empty]",
    "test_pallas_vs_gold[multi_chunk_cols]",
    "test_pallas_vs_gold[powerlaw]",
    "test_rowends_vmem_resident[wheel_hub_spans_tiles-1024]",
    "test_rowends_vmem_resident[powerlaw-4096]",
    "test_gather_group_operator_matches_gold[wheel_hub_spans_tiles]",
    "test_gather_group_operator_matches_gold[powerlaw]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        if name in _SLOW_TESTS or item.name in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
