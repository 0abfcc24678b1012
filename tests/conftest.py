"""Test configuration: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so we
must also set the config flag programmatically before any backend is created.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU 3D-conv compiles are expensive (~1-3s
# per unique shape); caching them on disk makes repeated test runs fast.
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "atk_jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


@pytest.fixture
def eager():
    """Run op-by-op (per-op compile cache) — XLA-CPU whole-graph 3D-conv compiles
    take ~30s+ per network, which we don't want to pay in shape-only tests."""
    with jax.disable_jit():
        yield
