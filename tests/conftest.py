"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin and
sets JAX_PLATFORMS=axon in every process; a plain env var does not
override it, so we force the CPU backend through jax.config before any
computation runs.  XLA_FLAGS must be set before jax initializes its
backends, hence this conftest is imported first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(4664397)
