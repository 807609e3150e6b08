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

import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/scenes"


@pytest.fixture
def reference_scenes():
    if not os.path.isdir(REFERENCE_SCENES):
        pytest.skip("reference scene corpus not available")
    return REFERENCE_SCENES
