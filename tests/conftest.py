"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (cargo test on CPU; see SURVEY.md §4):
every kernel has a CPU-exact path, and multi-chip sharding is validated on
virtual devices without TPU hardware.
"""

import os

# this image's jax build honors JAX_PLATFORM_NAME (legacy) but not
# JAX_PLATFORMS; set both, plus the config knob below, to stay off the
# tunneled TPU during tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

# Persistent compilation cache: DISABLED for tests. Round 4 gave tests a
# private throwaway dir (ruling out cross-process sharing with TPU spool
# runs after a read-path segfault); a round-5 full-suite run then
# segfaulted in the cache's native WRITE path
# (compilation_cache.put_executable_and_time, during
# test_pallas.py::test_halfg_matches_fs — hundreds of compilations into
# the run), proving the native cache path itself is unsafe late in a
# long-lived XLA:CPU process regardless of sharing. A per-run throwaway
# dir provides NO caching benefit anyway (nothing persists across runs,
# and within a run the in-memory jit cache already dedupes), so turning
# it off costs nothing and removes the crash surface. The cache code is
# still exercised by tests/test_aot_cache.py and by every real CLI /
# bench / spool process. HELM_TPU_COMPILE_CACHE="" is the documented
# disable convention (helm_tpu/compile_cache.py).
if "HELM_TPU_COMPILE_CACHE" not in os.environ:
    os.environ["HELM_TPU_COMPILE_CACHE"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import faulthandler  # noqa: E402

# round-3 full-suite run segfaulted once near the end (test_sharding on
# the virtual CPU mesh; passes in isolation). Dump native tracebacks on
# SIGSEGV/SIGABRT so any recurrence pins the crashing frame instead of
# dying silently.
faulthandler.enable(all_threads=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (real parameter sets)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=None):
        return
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
