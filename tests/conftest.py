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


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
