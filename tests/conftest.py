"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths run without TPU hardware (SURVEY.md §4).

The environment's axon sitecustomize registers a TPU PJRT plugin at
interpreter startup and sets ``jax_platforms=axon,cpu``; we override the
config (backends are not initialized yet at conftest import time) and
request 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite is compile-dominated on
# this 1-core host; repeat runs reuse every compiled step/render program.
from nerfsr_tpu.utils.devbench import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.expanduser("~/.cache/nerfsr_tpu/xla-tests"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process launches)")


_TESTS_RUN = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_live_executables():
    """jax 0.9.0's CPU backend segfaults (serialize/deserialize/compile
    of a big sharded program — whichever comes first) once ~220 tests'
    worth of live compiled executables have accumulated in one process;
    the same tests pass solo, in pairs, or early in the run, and the
    crash follows the POSITION, not the test (observed in
    test_system's mesh steps and, after reordering, in
    test_round3_polish). Dropping jax's in-memory executable caches
    every 50 tests keeps the live-executable population bounded; the
    persistent file cache makes the re-loads cheap."""
    yield
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 50 == 0:
        jax.clear_caches()
