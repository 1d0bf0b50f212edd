"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4.6). The env vars must be set
before jax initializes its backends, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
