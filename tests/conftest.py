"""Test configuration: force an 8-device virtual CPU mesh so batched and
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md
section 4)."""

import os

# Force the CPU backend even when a TPU plugin (axon) self-registered at
# interpreter startup and overrode jax_platforms: tests must never contend
# for the single tunneled TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
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
    return np.random.default_rng(0)
