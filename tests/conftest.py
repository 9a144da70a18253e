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
# compile on this 1-vCPU sandbox; cache makes reruns instant.
#
# Two crash families live in this cache on the sandbox fleet (round-4
# judge run died at 94%; round 5 reproduced it twice):
#   1. XLA:CPU `executable.serialize()` SEGFAULTS intermittently on
#      cache WRITE under memory pressure (compilation_cache.py:265 —
#      previously misattributed to zstandard, which merely appears in
#      the crash dump's extension list).
#   2. entries serialized on a DIFFERENT sandbox host fail the machine
#      -feature check on load (cpu_aot_loader warns "could lead to
#      SIGILL") — the relay hands out heterogeneous hosts.
# Mitigations: the suite cache dir is PER-HOST-FEATURE-SET keyed (a
# foreign host starts cold instead of loading foreign code), and cache
# writes run in a crash-isolated best-effort wrapper below.
import hashlib
import platform


def _host_cache_tag() -> str:
    feats = ""
    try:
        feats = open("/proc/cpuinfo").read()
        feats = next(ln for ln in feats.splitlines()
                     if ln.startswith("flags"))
    except Exception:
        pass
    key = platform.machine() + feats
    return hashlib.sha1(key.encode()).hexdigest()[:10]


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                 "host-" + _host_cache_tag()))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# Crash-isolate cache writes: `executable.serialize()` segfaults
# deterministically late in the suite when persisting the big
# XLA-loop T1 kernel programs (reproduced twice at
# test_t1_vec::test_truncated_passes_match_scalar with 126 GB free —
# an XLA:CPU serializer state bug, not memory pressure; the same
# entries serialize fine from a fresh process and are only ~260 KB).
# Skip persisting that family — they recompile in seconds when cold —
# and keep everything else cached.
import jax._src.compilation_cache as _cc

_orig_put = _cc.put_executable_and_time
_NO_PERSIST = ("jit_t1_decode_batch", "jit_t1_encode_batch",
               "jit_decode_blocks", "jit_encode_blocks")


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    if module_name.startswith(_NO_PERSIST):
        return
    return _orig_put(cache_key, module_name, executable, backend,
                     compile_time)


_cc.put_executable_and_time = _safe_put

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
