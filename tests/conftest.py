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

# ---------------------------------------------------------------------------
# slow-test marking (data-driven): tests/slow_tests.txt lists the node ids
# measured >~10s on the 8-CPU mesh (regenerate with
# `pytest -q --durations=60` and refresh the file). `-m "not slow"` is the
# fast default loop (<5 min); the full suite stays the pre-commit bar for
# model/kernel changes.
# ---------------------------------------------------------------------------

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _load_slow_ids():
    ids = set()
    prefixes = set()
    try:
        with open(_SLOW_LIST) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ids.add(line)
                # a parametrized entry marks ALL its siblings: the param
                # only changes which branch runs, not the model size
                if "[" in line:
                    prefixes.add(line.split("[", 1)[0])
    except OSError:
        pass
    return ids, prefixes


def pytest_collection_modifyitems(config, items):
    ids, prefixes = _load_slow_ids()
    for item in items:
        nodeid = item.nodeid
        base = nodeid.split("[", 1)[0]
        if nodeid in ids or base in prefixes or base in ids:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
