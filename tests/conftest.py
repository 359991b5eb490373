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
# NOTE: a persistent XLA compilation cache was tried here (round 4) and
# REVERTED: XLA:CPU AOT cache entries record compile-machine features
# (prefer-no-scatter/gather) that fail the load-time host check and warn
# about potential SIGILL — a correctness risk no test-lane speedup is
# worth. Warm-lane timing relies on the slow-mark split instead.
#
# NOTE: --xla_backend_optimization_level=0 was probed (round 5) as a
# suite-wide compile-time cut (391 s -> 276 s) and REJECTED: at opt-0 the
# jitted train step's gradients go NaN on XLA:CPU (pointnetvlad trunk,
# step 2) while the IDENTICAL math computed eagerly — each primitive also
# compiled at opt-0 — stays finite, i.e. a whole-program opt-0 miscompile,
# not a repo numerics bug. Levels 1/2 are <10% faster than default.
# Correctness over speed, same verdict as the AOT cache above.
#
# Default-lane budget (round 5, third hygiene pass): 200 tests in 325 s on
# the 1-vCPU build box (368 s under load) — down from 411 s at the start of
# the pass. The remaining time is ~40 distinct jit compiles of genuinely
# distinct programs (trunk grads, PP schedules, SP shards, torch-parity
# models); savings across them are sub-additive (shared warm caches), and
# both whole-suite compile-time levers measured available on XLA:CPU (AOT
# cache, opt-0) are rejected above for correctness. Further cuts would
# drop default-lane coverage for single-digit seconds, so ~325 s is the
# accepted floor on this box; the original 300 s aspiration assumed the
# faster box earlier rounds ran on.

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
