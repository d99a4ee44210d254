"""Test configuration.

- The environment pins JAX_PLATFORMS=axon (a tunneled TPU with ~0.5s/op
  remote compiles); tests must run on the local CPU backend, so override
  unconditionally before the first jax import.
- Per-op XLA compiles are slow here even on CPU, so tests jit whole ops and a
  persistent compilation cache makes repeat runs fast.
- Multi-device (mesh/sharding) tests spawn a subprocess with
  --xla_force_host_platform_device_count=8 (see tests/test_parallel.py);
  forcing 8 virtual devices process-wide makes every stray dispatch slow.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/ssnt_tts_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
