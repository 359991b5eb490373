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
    """Raises when asked for the batch at global position ``kill_after`` —
    a crash simulation inside the (prefetch-threaded) data pipeline.
    Counted by UNIQUE batch index (epochs tracked via start_batch==0
    rollovers), not by build count: mining-refresh boundaries restart the
    pipeline and legitimately REBUILD the prefetched batches they
    discarded, which must not advance the countdown."""

    def __init__(self, *args, kill_after: int, batches_per_epoch: int = 6,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.kill_after = kill_after
        self.batches_per_epoch = batches_per_epoch
        self.epoch = -1

    def epoch_batches(self, batch_size, rng, *args, start_batch=0, **kwargs):
        if start_batch == 0:
            self.epoch += 1
        inner = super().epoch_batches(
            batch_size, rng, *args, start_batch=start_batch, **kwargs
        )
        for off, item in enumerate(inner):
            gpos = self.epoch * self.batches_per_epoch + start_batch + off
            if gpos >= self.kill_after:
                raise RuntimeError("simulated crash")
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


@pytest.mark.slow
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


def test_fresh_run_into_existing_log_dir_fails_loud(tmp_path):
    """A non-resume run whose step keys collide with a previous run's
    checkpoints must raise, not silently drop the save while the resume
    sidecar advances (that combination corrupts a later --resume)."""
    import pytest

    from lpdnet_tpu.configs import ModelConfig, TrainConfig
    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.utils.checkpoint import CheckpointManager

    cfg_m = ModelConfig(
        trunk="pointnetvlad", num_points=32, feature_dim=16, num_clusters=4,
        output_dim=8, use_input_transform=False,
    )
    _, state = create_train_state(cfg_m, TrainConfig(), jax.random.key(0))

    d = str(tmp_path / "ck")
    m1 = CheckpointManager(d)
    m1.save(5, state, epoch=0, extra={"epoch": 0}, wait=True)
    m1.close()

    # "Second run" (no restore) colliding on the same key.
    m2 = CheckpointManager(d)
    with pytest.raises(FileExistsError, match="already exists"):
        m2.save(5, state, epoch=0, extra={"epoch": 9})
    # The sidecar must NOT have been advanced by the failed save.
    assert int(m2.load_extra(5)["epoch"]) == 0
    # After an explicit restore, re-saving the restored key is the
    # legitimate degenerate-resume case: position advances, no error.
    m2.restore(state, 5)
    m2.save(5, state, epoch=0, extra={"epoch": 9})
    assert int(m2.load_extra(5)["epoch"]) == 9
    m2.close()


def test_prefetch_iterator_close_stops_worker():
    """Abandoning the pipeline mid-stream (the mining-refresh restart)
    must stop the worker thread instead of leaking it on a full queue."""
    import threading
    import time

    from lpdnet_tpu.utils.pipeline import prefetch_iterator

    before = threading.active_count()
    produced = []

    def slow_source():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iterator(slow_source(), depth=2)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # the source was actually abandoned


@pytest.mark.slow
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
