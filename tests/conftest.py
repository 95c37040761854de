"""Test env: force CPU with 8 virtual devices (SURVEY.md §4 "Multi-chip
without a cluster") BEFORE jax import. All tests are deterministic and
CPU-runnable; real-TPU behaviour is exercised by bench.py and the driver's
compile checks."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the
# environment; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
