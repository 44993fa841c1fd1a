"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; JAX's host-platform device-count
flag fakes an 8-device mesh on CPU so every sharding/collective path is exercised
(the TPU-world equivalent of a fake backend). Must run before jax is imported.
"""

import os

# DL_BIOMASS_TPU_TESTS=1 runs the on-device suite (pytest -m tpu) against the
# real chip: keep the ambient TPU platform instead of forcing the CPU mesh.
_TPU_MODE = os.environ.get("DL_BIOMASS_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env var —
# override it back at config level so tests really run on the virtual CPU mesh.
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# Compiles are shipped to a remote service in this environment (~30s round trip);
# a persistent on-disk cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
