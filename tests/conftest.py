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

# The zstandard C compressor SEGFAULTS inside JAX's persistent-cache
# write under this 1-vCPU host's memory pressure (round-4 judge run died
# at 94%; reproduced round 5 under concurrent load).  Force the zlib
# fallback for the test suite — cache keys include the compressor name,
# so zlib entries coexist with the TPU tools' zstd entries.
import jax._src.compilation_cache as _cc

_cc.zstandard = None

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode kernel tests costing minutes; skipped "
        "unless GROK_RUN_SLOW=1 (Mosaic paths run on hardware via "
        "tools/hw_validate.py)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GROK_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow interpret kernel test; set GROK_RUN_SLOW=1")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
