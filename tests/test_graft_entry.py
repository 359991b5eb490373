"""Driver-entry regression tests: ``dryrun_multichip`` must arrange its own
n-device fleet no matter what state the calling process's JAX backend is in
(round-1 failure: MULTICHIP_r01.json ok=false because the driver initialized
a 1-device backend before the dryrun could set platform/device-count knobs).
"""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra):
    env = dict(os.environ)
    # Strip the conftest-arranged fleet so the child sees the driver's world.
    env.pop("JAX_PLATFORMS", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("_LPDNET_DRYRUN_INNER", None)
    env.update(extra)
    return env


@pytest.mark.slow
def test_dryrun_multichip_from_initialized_1_device_backend():
    """Worst case: the caller already initialized a 1-device backend before
    calling dryrun_multichip (the round-1 driver scenario). Must fall back
    to a clean subprocess and pass."""
    script = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"  # 1-device CPU backend
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8)" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_cli_fresh_process():
    """Driver-style invocation in a fresh interpreter with no fleet
    pre-arranged: the in-process bootstrap must build the virtual fleet."""
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "multichip", "8"],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8)" in proc.stdout, proc.stdout
