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


def test_initialize_from_args_rejects_partial_flags():
    """--coordinator/--process_id without --num_processes must fail loud:
    silently skipping distributed init would run N independent
    single-process jobs into one shared log_dir."""
    import argparse

    from lpdnet_tpu.parallel.multiprocess import initialize_from_args

    ns = argparse.Namespace(
        distributed=False, coordinator="host:1234", num_processes=None,
        process_id=0,
    )
    with pytest.raises(ValueError, match="num_processes"):
        initialize_from_args(ns)
    ns = argparse.Namespace(
        distributed=False, coordinator=None, num_processes=None,
        process_id=1,
    )
    with pytest.raises(ValueError, match="num_processes"):
        initialize_from_args(ns)
    # No distributed flags at all -> plain single-process run.
    ns = argparse.Namespace(
        distributed=False, coordinator=None, num_processes=None,
        process_id=None,
    )
    assert initialize_from_args(ns) is False


def test_process_local_slice_single_process():
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    # One process owns everything -> the full range.
    assert process_local_slice(mesh, "data", 16) == slice(0, 16)
    with pytest.raises(ValueError, match="not divisible"):
        process_local_slice(mesh, "data", 12)


def _launch_cluster(log_dir: str, *extra_args: str,
                    expect_crash: bool = False) -> None:
    """Run one 2-worker x 4-CPU-device cluster to completion (or, with
    ``expect_crash``, to the simulated mid-epoch crash both workers hit)."""
    port = _free_port()
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
                "--log_dir", log_dir,
                *extra_args,
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
        if expect_crash:
            assert p.returncode == 7, f"expected simulated crash:\n{out[-4000:]}"
            assert "simulated crash" in out, out[-4000:]
        else:
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    """2 workers x 4 CPU devices (GSPMD DP train + mining refresh + eval
    sweep, process-local feeding) vs the in-process 8-device control."""
    mp_dir = str(tmp_path / "mp")
    sp_dir = str(tmp_path / "sp")

    _launch_cluster(mp_dir)

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


@pytest.mark.slow
def test_two_process_tp_sharded_checkpoint_resume(tmp_path):
    """Tensor parallelism ACROSS processes (data axis over DCN-analog
    process boundary, model axis within each process) with Orbax sharded
    checkpointing: (a) the full 2-epoch cluster run matches the
    single-process 8-device TP control; (b) a cluster stopped after epoch
    0 and resumed from its sharded checkpoint reproduces the uninterrupted
    cluster's epoch-1 loss EXACTLY; (c) the sharded-on-disk checkpoint
    cross-restores into a host-numpy state on one process."""
    full_dir = str(tmp_path / "full")
    res_dir = str(tmp_path / "res")
    frz_dir = str(tmp_path / "frz")
    sp_dir = str(tmp_path / "sp")

    _launch_cluster(full_dir, "--model_devices", "2")
    _launch_cluster(res_dir, "--model_devices", "2", "--max_epoch", "1")
    _launch_cluster(
        res_dir, "--model_devices", "2", "--max_epoch", "2", "--resume"
    )
    # The cross-topology comparison runs with frozen params (lr ~ 0):
    # at lr=1e-3 the per-forward reduction-order noise (~1e-7, Gloo vs
    # fused single-process reductions) plus occasional hinge activations
    # flipping at the margin compound chaotically through Adam's early
    # rsqrt — measured 4% after 12 steps — while the frozen runs isolate
    # the forward/collective math itself (measured <=2.6e-4, a single
    # marginal hinge flip; 1e-7 on hinge-stable epochs).
    _launch_cluster(frz_dir, "--model_devices", "2", "--lr", "1e-12")

    # Control: same workload, single process, same 8-device (4, 2) mesh.
    from tests.mp_worker import run

    run(sp_dir, model_devices=2, lr=1e-12)

    frz_epochs = _read_events(frz_dir, "epoch")
    sp_epochs = _read_events(sp_dir, "epoch")
    assert len(frz_epochs) == len(sp_epochs) == 2
    for m, s in zip(frz_epochs, sp_epochs):
        assert m["steps"] == s["steps"]
        assert abs(m["loss"] - s["loss"]) < 5e-3 * max(1.0, abs(s["loss"]))

    frz_eval = _read_events(frz_dir, "eval")
    sp_eval = _read_events(sp_dir, "eval")
    assert len(frz_eval) == len(sp_eval) == 1
    assert abs(
        frz_eval[0]["one_percent_recall"] - sp_eval[0]["one_percent_recall"]
    ) < 1e-6

    # Exact resume: same topology, same build -> bit-comparable.
    full_epochs = _read_events(full_dir, "epoch")
    res_epochs = _read_events(res_dir, "epoch")
    assert [r["epoch"] for r in res_epochs] == [0, 1]
    assert res_epochs[1]["loss"] == pytest.approx(
        full_epochs[1]["loss"], rel=1e-6
    )
    resumes = _read_events(res_dir, "resume")
    assert len(resumes) == 1 and resumes[0]["epoch"] == 1

    # Cross-restore: the sharded payload reads back host-locally.
    import jax

    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.utils.checkpoint import CheckpointManager
    from tests.mp_worker import tiny_config

    cfg = tiny_config(full_dir, model_devices=2)
    _, state = create_train_state(
        cfg.model, cfg.train, jax.random.key(cfg.train.seed),
        examples_per_step=4,
    )
    mgr = CheckpointManager(os.path.join(full_dir, "checkpoints"))
    state, epoch = mgr.restore(state)
    mgr.close()
    assert epoch == 1 and int(state.step) == 12
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_two_process_dp_pp_cluster(tmp_path):
    """Pipeline parallelism ACROSS processes (DPxPP: each process's 4
    devices form one pipeline replica's stages, data replicas across the
    process boundary): (a) the 2-process cluster reproduces the
    single-process 8-device (2 data x 4 stage) control — measured
    bit-exact here (the PP collectives are ppermute hops + one small
    psum, which reduce identically across builds, unlike the DP
    all-reduce above); (b) a cluster stopped after epoch 0 resumes
    through the STANDARD checkpoint payload (host-gathered stage stacks)
    to exactly the uninterrupted cluster's epoch-1 loss; (c) process-0
    owns all side effects."""
    mp_dir = str(tmp_path / "mp")
    sp_dir = str(tmp_path / "sp")
    res_dir = str(tmp_path / "res")

    _launch_cluster(mp_dir, "--pp_stages", "4", "--pp_data", "2")

    from tests.mp_worker import run

    run(sp_dir, pp_stages=4, pp_data=2)

    mp_epochs = _read_events(mp_dir, "epoch")
    sp_epochs = _read_events(sp_dir, "epoch")
    assert len(mp_epochs) == len(sp_epochs) == 2
    for m, s in zip(mp_epochs, sp_epochs):
        assert m["steps"] == s["steps"]
        assert m["loss"] == pytest.approx(s["loss"], rel=1e-6), (
            m["loss"], s["loss"],
        )
    mp_eval = _read_events(mp_dir, "eval")
    sp_eval = _read_events(sp_dir, "eval")
    assert len(mp_eval) == len(sp_eval) == 1
    assert abs(
        mp_eval[0]["one_percent_recall"] - sp_eval[0]["one_percent_recall"]
    ) < 1e-6

    # The pipeline really ran 2 replicas x 4 stages.
    pipes = _read_events(mp_dir, "pipeline")
    assert pipes and pipes[0]["stages"] == 4
    assert pipes[0]["data_replicas"] == 2

    # Primary-only side effects.
    assert os.path.isdir(os.path.join(mp_dir, "checkpoints"))
    assert os.path.isfile(os.path.join(mp_dir, "results.txt"))

    # Stop-after-epoch-0 cluster resumes exactly (standard payload).
    _launch_cluster(
        res_dir, "--pp_stages", "4", "--pp_data", "2", "--max_epoch", "1"
    )
    _launch_cluster(
        res_dir, "--pp_stages", "4", "--pp_data", "2", "--max_epoch", "2",
        "--resume",
    )
    res_epochs = _read_events(res_dir, "epoch")
    assert [r["epoch"] for r in res_epochs] == [0, 1]
    assert res_epochs[1]["loss"] == pytest.approx(
        mp_epochs[1]["loss"], rel=1e-6
    )


@pytest.mark.slow
def test_two_process_mid_epoch_kill_and_resume(tmp_path):
    """Failure recovery on the CLUSTER (SURVEY §5 failure-detection row,
    previously proven single-process only): a 2-process run whose workers
    both die mid-epoch 1 (deterministic data order -> same batch on every
    process, so the crash is collective-safe) must leave a committed
    step checkpoint + position sidecar, and a resumed cluster must land on
    EXACTLY the final state of an uninterrupted cluster run."""
    import jax

    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.utils.checkpoint import CheckpointManager
    from tests.mp_worker import tiny_config

    full_dir = str(tmp_path / "full")
    res_dir = str(tmp_path / "res")

    # A: uninterrupted 2-epoch cluster run with step checkpoints every 2
    # (3 global batches/epoch at DP=8 -> step saves at 2 and 5, epoch-end
    # saves at 3 and 6).
    _launch_cluster(full_dir, "--checkpoint_every_steps", "2")

    # B: identical run crashed at global batch 5 (epoch 1, batch 2) — one
    # batch after the step-5 mid-epoch save. The worker's orderly-crash
    # path grace-sleeps so the async Orbax commit (a cross-process
    # barrier) finalizes before the processes die.
    _launch_cluster(
        res_dir, "--checkpoint_every_steps", "2", "--kill_after", "5",
        expect_crash=True,
    )
    mgr = CheckpointManager(os.path.join(res_dir, "checkpoints"))
    key = mgr.latest_key()
    extra = mgr.load_extra(key)
    mgr.close()
    assert key == 5, key
    assert extra is not None
    assert int(extra["epoch"]) == 1 and int(extra["next_batch"]) == 2
    assert int(extra["mining_valid"]) == 1  # past warmup: cache snapshot

    # C: resume the cluster in B's log dir; must finish at step 6.
    _launch_cluster(
        res_dir, "--checkpoint_every_steps", "2", "--resume",
    )
    resumes = _read_events(res_dir, "resume")
    assert len(resumes) == 1 and resumes[0]["epoch"] == 1
    assert resumes[0]["batch"] == 2

    # Final states (key 6 in both dirs) must be bit-comparable: same
    # topology, same build, deterministic (seed, epoch, batch) randomness.
    def final_state(log_dir):
        cfg = tiny_config(log_dir)
        _, state = create_train_state(
            cfg.model, cfg.train, jax.random.key(cfg.train.seed),
            examples_per_step=8,
        )
        m = CheckpointManager(os.path.join(log_dir, "checkpoints"))
        state, epoch = m.restore(state)
        m.close()
        assert int(state.step) == 6 and epoch == 1
        return state

    a, c = final_state(full_dir), final_state(res_dir)
    for la, lc in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(c)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lc), rtol=0, atol=1e-7
        )


def test_null_logger_interface():
    from lpdnet_tpu.utils.logging import NullLogger

    lg = NullLogger()
    rec = lg.log("epoch", loss=1.0)
    assert rec["event"] == "epoch"
    lg.close()  # no-op, no files
