"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (SURVEY.md §7 testing strategy)."""

import os

# Prevent the axon TPU plugin from registering in test processes: its
# sitecustomize hook contacts the TPU pool at interpreter start (minutes of
# wall time) and overrides JAX_PLATFORMS. Tests are CPU-only by design.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hook runs at interpreter start (before this file)
# and may have imported jax with JAX_PLATFORMS=axon already baked into the
# config — env mutation above is then too late. Forcing the config value
# works as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
