"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: unit tests exercise numerics and sharding on a virtual 8-device
# CPU mesh. The environment pre-imports jax with JAX_PLATFORMS=axon (remote
# TPU tunnel), so setting the env var alone is not enough — update jax.config
# explicitly before any backend is initialized.
if os.environ.get("V2F_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("V2F_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
