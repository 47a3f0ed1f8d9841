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

# Private per-session persistent-compilation-cache dir. Some tests run
# entry points that call enable_compile_cache() in-process (serve.py),
# which would otherwise point THIS process — and every later test — at
# the repo-level .jax_cache shared with concurrently-running TPU spool /
# bench processes. A full-suite run segfaulted inside the cache's native
# read path (compilation_cache.get_executable_and_time) with that
# sharing in place; a throwaway dir keeps the cache code exercised
# without cross-process traffic. Subprocess children inherit it.
if "HELM_TPU_COMPILE_CACHE" not in os.environ:
    import tempfile

    os.environ["HELM_TPU_COMPILE_CACHE"] = tempfile.mkdtemp(
        prefix="helm_tpu_test_jax_cache_"
    )
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
