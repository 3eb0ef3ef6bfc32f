"""Test configuration: force an 8-device virtual CPU mesh so sharding and
collective paths are exercised without TPU hardware (SURVEY.md section 4 item 4).

Note: the environment's sitecustomize imports jax at interpreter startup (the
axon TPU plugin), so setting JAX_PLATFORMS here is too late — instead we use
jax.config before any backend is initialized, which conftest import order
guarantees.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent jit cache: the tiny-model train-step graphs take minutes to
# compile on the 2-vCPU host; repeat test runs hit the cache instead.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
