"""Step-level async checkpointing + exact mid-epoch resume (VERDICT round 1
item 8; SURVEY §5 failure-recovery row). A training run killed mid-epoch
and resumed from the last step checkpoint must land on EXACTLY the state of
an uninterrupted run: per-batch randomness is keyed by (seed, epoch, batch),
the checkpoint sidecar carries (epoch, next batch, queries done) and the
mining-cache snapshot, and the resumed epoch skips consumed batches without
disturbing the remaining random draws.
"""

import numpy as np
import jax
import pytest

from lpdnet_tpu.configs import (
    Config, DataConfig, EvalConfig, MeshConfig, MiningConfig, ModelConfig,
    TrainConfig,
)
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.train.loop import TrainResources, train

N = 48


class KillingSampler(TupleSampler):
    """Raises after yielding ``kill_after`` batches across all epochs —
    a crash simulation inside the (prefetch-threaded) data pipeline."""

    def __init__(self, *args, kill_after: int, **kwargs):
        super().__init__(*args, **kwargs)
        self.kill_after = kill_after
        self.yielded = 0

    def epoch_batches(self, *args, **kwargs):
        for item in super().epoch_batches(*args, **kwargs):
            if self.yielded >= self.kill_after:
                raise RuntimeError("simulated crash")
            self.yielded += 1
            yield item


def make_cfg(log_dir, resume=False, max_epoch=2):
    return Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=N, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=False,
        ),
        data=DataConfig(num_points=N),
        train=TrainConfig(
            batch_num_queries=4, positives_per_query=2,
            negatives_per_query=4, max_epoch=max_epoch,
            base_learning_rate=1e-3,
            log_dir=str(log_dir), resume=resume,
            checkpoint_every_steps=2,
            mining=MiningConfig(
                warmup_epochs=0, cache_refresh_queries=12,
                hard_negatives_per_query=2, sampled_negatives=10,
            ),
        ),
        eval=EvalConfig(batch_size=8),
        mesh=MeshConfig(),
    )


def make_ds():
    return make_synthetic_dataset(
        num_places=6, submaps_per_place=4, num_points=N
    )


def leaves(state):
    return [
        np.asarray(leaf)
        for leaf in jax.tree_util.tree_leaves(
            {"p": state.params, "b": state.batch_stats, "o": state.opt_state}
        )
    ]


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    ds = make_ds()

    def resources(sampler):
        return TrainResources(sampler=sampler, loader=ds.loader)

    # A: the uninterrupted reference run (2 epochs x 6 batches).
    cfg_a = make_cfg(tmp_path / "a")
    out_a = train(
        cfg_a,
        resources(TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)),
        use_mesh=False,
    )
    assert int(out_a["state"].step) == 12

    # B: same run, crash after 8 batches (mid-epoch 1).
    cfg_b = make_cfg(tmp_path / "b")
    killer = KillingSampler(
        ds.queries, ds.loader, num_pos=2, num_neg=4, kill_after=8
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        train(cfg_b, resources(killer), use_mesh=False)

    # A step checkpoint with a position sidecar must exist mid-epoch 1.
    # The step-8 save is async; in-process the writer thread completes even
    # though train() raised — poll until Orbax registers it (a real crash
    # would leave step 6, from which resume is equally exact).
    import time

    from lpdnet_tpu.utils.checkpoint import CheckpointManager

    deadline = time.time() + 60
    key = None
    while time.time() < deadline:
        mgr = CheckpointManager(str(tmp_path / "b" / "checkpoints"))
        key = mgr.latest_key()
        mgr.close()
        if key == 8:
            break
        time.sleep(0.5)
    assert key == 8, key
    mgr = CheckpointManager(str(tmp_path / "b" / "checkpoints"))
    extra = mgr.load_extra(key)
    assert extra is not None
    assert int(extra["epoch"]) == 1 and int(extra["next_batch"]) == 2
    assert int(extra["mining_valid"]) == 1  # warmup 0: cache snapshot saved
    mgr.close()

    # C: resume from the crash and finish; must equal run A exactly.
    cfg_c = make_cfg(tmp_path / "b", resume=True)
    out_c = train(
        cfg_c,
        resources(TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)),
        use_mesh=False,
    )
    assert int(out_c["state"].step) == 12
    for a, c in zip(leaves(out_a["state"]), leaves(out_c["state"])):
        np.testing.assert_allclose(a, c, rtol=0, atol=1e-7)


def test_epoch_boundary_resume_still_works(tmp_path):
    """The pre-existing whole-epoch resume path through the new
    position-sidecar machinery: stop after epoch 0, resume into epoch 1."""
    ds = make_ds()
    train(
        make_cfg(tmp_path / "log", max_epoch=1),
        TrainResources(
            sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
            loader=ds.loader,
        ),
        use_mesh=False,
    )

    out = train(
        make_cfg(tmp_path / "log", resume=True, max_epoch=2),
        TrainResources(
            sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
            loader=ds.loader,
        ),
        use_mesh=False,
    )
    assert int(out["state"].step) == 12
    import json

    recs = [
        json.loads(line)
        for line in open(tmp_path / "log" / "metrics.jsonl")
    ]
    resumes = [r for r in recs if r["event"] == "resume"]
    assert resumes and resumes[-1]["epoch"] == 1 and resumes[-1]["batch"] == 0
    epochs = [r["epoch"] for r in recs if r["event"] == "epoch"]
    assert epochs == [0, 1]
