"""Test configuration.

Tests run on a simulated 8-device CPU mesh so multi-chip sharding logic is
exercised without a pod (SURVEY.md §4).  Set MERGE_SPMV_TEST_TPU=1 to run the
suite against real TPU devices instead.
"""

import os

if not os.environ.get("MERGE_SPMV_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
