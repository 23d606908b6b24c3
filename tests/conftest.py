"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the 'axon' TPU platform and forces
``jax_platforms`` before any user code runs, so plain env vars are not
enough — override the config after import, before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
