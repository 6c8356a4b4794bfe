"""Test configuration: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (the driver validates real multi-chip separately via
__graft_entry__.dryrun_multichip). Must run before jax is imported."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The tunneled-TPU ("axon") PJRT plugin ignores the JAX_PLATFORMS env var, so
# force the CPU backend through the config API (must precede device use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cuda_recommender_tpu.data import datasets  # noqa: E402


@pytest.fixture(scope="session")
def small_data():
    """Small power-law synthetic dataset shared across tests."""
    return datasets.synthetic(m=300, n=120, nnz=6000, seed=7)


@pytest.fixture(scope="session")
def tiny_data():
    return datasets.synthetic(m=40, n=25, nnz=400, seed=3, power_law=False)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
