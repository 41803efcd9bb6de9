"""Test session setup: force an 8-device virtual CPU mesh before JAX use.

This is the standard fake-multi-device trick (SURVEY.md §4): all sharding /
collective tests run against 8 virtual CPU devices, so the multi-chip paths
are exercised without TPU hardware.
"""

import os

# Force CPU: the session environment may pin JAX_PLATFORMS to a remote TPU
# backend (axon), which is far too slow for a many-small-kernels test suite.
os.environ["JAX_PLATFORMS"] = "cpu"

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in _flags:
    # single-core CI box: compile time dominates; trade optimized code for
    # much cheaper compiles
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags.strip()

# A sitecustomize hook may have force-registered the TPU backend and set
# jax_platforms to "axon,cpu" regardless of the environment; override it at
# config level before any test touches a device.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Persistent compilation cache: with a single CPU core, XLA compile time
# dominates the suite; cached executables make repeat runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/ured_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
