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

# Persistent compilation cache (verified to work for the CPU backend in
# this jax build): the suite's wall time is dominated by CPU compiles of
# the cascade programs, and they are identical run to run — the second
# `make test-fast` (and the @slow phase after a fast phase) reuses them
# instead of recompiling. Keyed on backend/flags/jax-version, so the
# 8-virtual-device mesh entries stay distinct. Override the location with
# JAX_COMPILATION_CACHE_DIR; wipe the dir to force cold compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   "/tmp/rrin_tpu_test_jax_cache"),
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
