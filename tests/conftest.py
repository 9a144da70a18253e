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
# persistent compile cache: the batched T1 kernels take ~1 min each to
# compile on this 1-vCPU sandbox; cache makes reruns instant
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
