"""Test environment: force an 8-device virtual CPU platform.

Tests exercise the pjit/Mesh code paths without TPU hardware
(xla_force_host_platform_device_count, per SURVEY.md §4).  Must run before
jax initializes a backend, hence the env mutation at module import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) force-selects jax_platforms="axon,cpu"
# at interpreter start; override back to CPU before any backend initializes
# so unit tests run locally on the 8-device virtual mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
