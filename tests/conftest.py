"""Test configuration.

The axon sitecustomize imports jax at interpreter startup and pins
jax.config jax_platforms="axon,cpu" (the tunneled TPU, ~0.5s/op remote
compiles). Env vars are therefore ineffective; the only reliable override is
jax.config.update after import, before first backend use. XLA_FLAGS for the
8 virtual CPU devices (multi-chip sharding tests) must also be set before the
CPU client initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/ssnt_tts_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
