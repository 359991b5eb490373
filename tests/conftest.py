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
# Persistent XLA compilation cache: most of the default lane's wall time
# is CPU compiles of the same programs run-to-run; caching them is safe
# (keys are HLO hashes) and cuts warm re-runs well under the 5-min
# target. Disable with LPDNET_TEST_NO_CACHE=1 to time true cold runs.
if not os.environ.get("LPDNET_TEST_NO_CACHE"):
    _cache_dir = os.path.expanduser("~/.cache/lpdnet_tpu_xla_tests")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full-scale parity, soak-style "
        "integration; the default lane stays under ~5 minutes)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
