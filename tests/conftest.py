"""Test harness: force CPU with 8 virtual devices so data-parallel sharding
logic is testable on a single host (SURVEY §4 "distributed without a
cluster").

Note: this image's sitecustomize registers the TPU PJRT plugin at interpreter
start and sets ``jax_platforms='axon,cpu'``, so overriding the env var alone
is not enough — the jax config must be updated explicitly before any backend
is initialized. Device-count flag goes through XLA_FLAGS, which the CPU
backend reads lazily at first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
