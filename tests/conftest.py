"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4.6). The env vars must be set
before jax initializes its backends, hence at conftest import time.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (TPU tunnel); tests must run on the
# host CPU with 8 virtual devices, so override — not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA compiles are pathologically slow in this sandbox (~0.4s per tiny op);
# a persistent on-disk cache makes reruns cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
