"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
xla_force_host_platform_device_count (the standard JAX idiom).  Must
run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-import jax with a TPU plugin platform (e.g.
# via sitecustomize); config.update still wins before backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: golden/renderer tests re-jit identical
# programs across runs; first run pays, reruns are cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import signal  # noqa: E402

import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/scenes"

# Per-test timeout: a traversal bug must FAIL fast, not wedge the
# suite (kernel parity tests run interpret-mode Python loops, which
# SIGALRM interrupts fine).  Override per test with
# @pytest.mark.timeout(seconds).
DEFAULT_TEST_TIMEOUT = 300


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "timeout(seconds): per-test wall-clock limit")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    seconds = int(marker.args[0]) if marker else DEFAULT_TEST_TIMEOUT

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded {seconds}s timeout (tests/conftest.py)")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def reference_scenes():
    if not os.path.isdir(REFERENCE_SCENES):
        pytest.skip("reference scene corpus not available")
    return REFERENCE_SCENES
