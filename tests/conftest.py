"""Test environment: force an 8-device virtual CPU platform.

Tests exercise the pjit/Mesh code paths without TPU hardware
(xla_force_host_platform_device_count, per SURVEY.md §4).  Must run before
jax initializes a backend, hence the env mutation at module import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices share ONE physical core here: a collective's
    # rendezvous threads can all be starved for >30 s when another
    # compile runs in the same process, and XLA's default terminate
    # timeout hard-aborts the interpreter (observed killing the full
    # suite inside test_parallel.py while the same test passes alone).
    # Stretch the warn/terminate deadlines; correctness is unaffected.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) force-selects jax_platforms="axon,cpu"
# at interpreter start; override back to CPU before any backend initializes
# so unit tests run locally on the 8-device virtual mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: model-sized jits dominate suite wall time on
# this 1-core host (30-90 s per ResNet-scale program); cached reloads
# are near-instant, so re-runs of the suite drop from ~25 min to minutes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/scat_tpu_xla_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
