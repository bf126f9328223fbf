"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote TPU backend and forces
``jax_platforms`` to include it, so the JAX_PLATFORMS env var alone is not
enough — we override the config before any backend initializes. Must run
before test modules import jax-dependent code; pytest imports conftest
first, so doing it at import time here is sufficient.
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
