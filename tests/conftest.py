"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise the multi-chip sharding paths on a virtual CPU mesh, as the CI
machine has at most one real TPU chip. The ambient environment pins
JAX_PLATFORMS to the TPU plugin, which overrides the env var — the
jax.config update below is authoritative. Must run before any test imports jax
code paths that create arrays.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # Single-threaded eigen avoids 8-way thread oversubscription on the 1-core
    # CI host, which otherwise trips XLA's 40 s collective-rendezvous timeout.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8 --xla_cpu_multi_thread_eigen=false"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA:CPU compiles of the
# same programs on every run; warm reruns skip them (same directory as
# bench.py / the CLIs, keyed by HLO hash so CPU and TPU entries coexist).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(12345)
