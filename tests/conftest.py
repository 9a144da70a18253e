"""Test harness config: force CPU backend with 8 virtual devices.

Device (TPU) compiles are exercised separately by the driver via
__graft_entry__.py; unit tests run on the CPU backend with a virtual
8-device mesh so multi-chip sharding paths are covered without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sandbox's "axon" PJRT plugin ignores JAX_PLATFORMS; the config update
# below is what actually pins the CPU backend (TPU-tunnel compiles hang).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
