"""Test env: force CPU jax with 8 virtual devices so mesh/sharding logic is
testable without a pod (SURVEY.md §4). Must run before jax initializes."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the axon TPU plugin presets this env var
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache: repeat test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

# The axon TPU plugin's sitecustomize sets jax.config.jax_platforms="axon,cpu"
# programmatically, overriding the env var — force CPU after import so tests
# run on the 8 virtual host devices instead of round-tripping the TPU relay.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
