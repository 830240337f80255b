"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding tests run on this virtual mesh (the real environment has a
single TPU chip); numerical tests also run on CPU for determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox boots jax with a TPU plugin from sitecustomize before conftest
# runs, so the env vars above are not enough — override the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
