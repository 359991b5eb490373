"""Multi-process runtime (parallel/multiprocess.py): a real 2-process x
4-CPU-device jax.distributed cluster driven by subprocesses must reproduce
the single-process 8-device run — same global mesh, same data order, same
step program; only the feeding (process-local rows) and side-effect
ownership (process 0) differ. VERDICT round-2 item 1.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from lpdnet_tpu.parallel.multiprocess import process_local_slice

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _read_events(log_dir: str, event: str):
    path = os.path.join(log_dir, "metrics.jsonl")
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    return [r for r in recs if r["event"] == event]


def test_process_local_slice_single_process():
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    # One process owns everything -> the full range.
    assert process_local_slice(mesh, "data", 16) == slice(0, 16)
    with pytest.raises(ValueError, match="not divisible"):
        process_local_slice(mesh, "data", 12)


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    """2 workers x 4 CPU devices (GSPMD DP train + mining refresh + eval
    sweep, process-local feeding) vs the in-process 8-device control."""
    port = _free_port()
    mp_dir = str(tmp_path / "mp")
    sp_dir = str(tmp_path / "sp")

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER,
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2",
                "--process_id", str(pid),
                "--local_devices", "4",
                "--log_dir", mp_dir,
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # Control: same workload on this process's 8 virtual devices.
    from tests.mp_worker import run

    run(sp_dir)

    # Process 0 wrote metrics; process 1 wrote nothing.
    mp_epochs = _read_events(mp_dir, "epoch")
    sp_epochs = _read_events(sp_dir, "epoch")
    assert len(mp_epochs) == len(sp_epochs) == 2
    for m, s in zip(mp_epochs, sp_epochs):
        assert m["steps"] == s["steps"]
        # Same global batches + same step program, but the partitioner
        # really communicates (Gloo allreduce) and fuses differently than
        # the single-process build, so reduction-order noise compounds
        # through BN + Adam over the epoch: close, not bit-equal
        # (measured ~1.6e-3 after 3 steps).
        assert abs(m["loss"] - s["loss"]) < 0.02 * max(
            1.0, abs(s["loss"])
        ), (m["loss"], s["loss"])

    mp_eval = _read_events(mp_dir, "eval")
    sp_eval = _read_events(sp_dir, "eval")
    assert len(mp_eval) == len(sp_eval) == 1
    assert abs(
        mp_eval[0]["one_percent_recall"] - sp_eval[0]["one_percent_recall"]
    ) < 1e-6
    assert abs(
        mp_eval[0]["recall_at_1"] - sp_eval[0]["recall_at_1"]
    ) < 1e-6

    # Primary-only side effects: checkpoints + results exist exactly once.
    assert os.path.isdir(os.path.join(mp_dir, "checkpoints"))
    assert os.path.isfile(os.path.join(mp_dir, "results.txt"))
    assert os.path.isfile(os.path.join(mp_dir, "config.json"))


def test_null_logger_interface():
    from lpdnet_tpu.utils.logging import NullLogger

    lg = NullLogger()
    rec = lg.log("epoch", loss=1.0)
    assert rec["event"] == "epoch"
    lg.close()  # no-op, no files
