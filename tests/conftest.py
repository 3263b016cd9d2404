"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX trick —
SURVEY.md §4.4) so sharded code paths are exercised without TPU hardware.
Must set the env before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# This image force-registers the axon TPU plugin ahead of the env var; the
# config update below actually pins tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tmp_media_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("media")
