"""Test configuration: force CPU with an 8-device virtual mesh.

The reference has no distributed tests at all (SURVEY.md §4); we test
sharding on a host-platform device mesh so every multi-chip code path
is exercised without TPU hardware.

Note: the environment's sitecustomize registers the `axon` TPU-tunnel
platform and forces jax_platforms="axon,cpu" via jax.config — an env
var is not enough to override it, so we update the config directly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
