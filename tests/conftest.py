"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise the multi-chip sharding paths on a virtual CPU mesh, as the CI
machine has at most one real TPU chip. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(12345)
