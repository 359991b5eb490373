"""One process of the multi-process CPU test cluster
(tests/test_multiprocess.py), and the shared tiny training config.

Run as a script it joins an N-process jax.distributed cluster (4 local CPU
devices each) and trains; imported, :func:`run` is the identical workload
the single-process 8-device control executes in the pytest process — the
loss trajectories must match across the two topologies because the global
mesh, data order, and step program are the same.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_config(log_dir: str, model_devices: int = 1, max_epoch: int = 2,
                resume: bool = False, lr: float = 1e-3,
                checkpoint_every_steps: int = 0,
                pp_stages: int = 0, pp_data: int = 1):
    from lpdnet_tpu.configs import (
        Config, DataConfig, EvalConfig, FeatureConfig, MeshConfig,
        MiningConfig, ModelConfig, TrainConfig,
    )

    n_points = 64
    return Config(
        model=ModelConfig(
            trunk="lpdnet", num_points=n_points, feature_dim=64,
            num_clusters=8, output_dim=32, graph_k=6,
            features=FeatureConfig(k=6, knn_block=64),
        ),
        data=DataConfig(num_points=n_points),
        train=TrainConfig(
            batch_num_queries=1,  # per-device: global batch = data-axis size
            positives_per_query=2, negatives_per_query=4,
            max_epoch=max_epoch, base_learning_rate=lr,
            min_learning_rate=min(lr, 1e-5), log_dir=log_dir,
            resume=resume,
            eval_every_epochs=2, checkpoint_every_epochs=1,
            checkpoint_every_steps=checkpoint_every_steps,
            mining=MiningConfig(
                warmup_epochs=1, hard_negatives_per_query=2,
                cache_refresh_queries=10_000, sampled_negatives=8,
            ),
        ),
        eval=EvalConfig(batch_size=8, top_k=5),
        mesh=MeshConfig(
            model_devices=model_devices,
            pipeline_stages=pp_stages,
            pipeline_data_replicas=pp_data,
        ),
    )


def make_killing_sampler_cls():
    """A TupleSampler that raises at a fixed global batch index — the
    cluster crash simulation (mirrors tests/test_step_checkpoint.py's
    KillingSampler). Deterministic data order means every process hits the
    same batch, so all workers die together instead of hanging a
    collective."""
    from lpdnet_tpu.data.tuples import TupleSampler

    class KillingSampler(TupleSampler):
        def __init__(self, *args, kill_after: int,
                     batches_per_epoch: int = 3, **kwargs):
            super().__init__(*args, **kwargs)
            self.kill_after = kill_after
            self.batches_per_epoch = batches_per_epoch
            self.epoch = -1

        def epoch_batches(self, batch_size, rng, *args, start_batch=0,
                          **kwargs):
            if start_batch == 0:
                self.epoch += 1
            inner = super().epoch_batches(
                batch_size, rng, *args, start_batch=start_batch, **kwargs
            )
            for off, item in enumerate(inner):
                gpos = (self.epoch * self.batches_per_epoch
                        + start_batch + off)
                if gpos >= self.kill_after:
                    raise RuntimeError("simulated crash")
                yield item

    return KillingSampler


def run(log_dir: str, model_devices: int = 1, max_epoch: int = 2,
        resume: bool = False, lr: float = 1e-3,
        checkpoint_every_steps: int = 0, kill_after: int = 0,
        pp_stages: int = 0, pp_data: int = 1):
    """Train the tiny synthetic workload; returns the loop's result dict.
    Identical on every topology that presents the same 8-device mesh."""
    import numpy as np  # noqa: F401

    from lpdnet_tpu.data.synthetic import make_synthetic_dataset
    from lpdnet_tpu.data.tuples import TupleSampler
    from lpdnet_tpu.train.loop import TrainResources, train

    cfg = tiny_config(log_dir, model_devices, max_epoch, resume, lr,
                      checkpoint_every_steps, pp_stages, pp_data)
    ds = make_synthetic_dataset(
        num_places=6, submaps_per_place=4,
        num_points=cfg.model.num_points, seed=cfg.train.seed,
    )
    sampler_kwargs = dict(
        num_pos=cfg.train.positives_per_query,
        num_neg=cfg.train.negatives_per_query,
    )
    if kill_after:
        sampler = make_killing_sampler_cls()(
            ds.queries, ds.loader, kill_after=kill_after, **sampler_kwargs
        )
    else:
        sampler = TupleSampler(ds.queries, ds.loader, **sampler_kwargs)
    res = TrainResources(
        sampler=sampler,
        loader=ds.loader,
        database_sets=ds.database_sets,
        query_sets=ds.query_sets,
    )
    return train(cfg, res)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--model_devices", type=int, default=1)
    ap.add_argument("--max_epoch", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--checkpoint_every_steps", type=int, default=0)
    ap.add_argument("--kill_after", type=int, default=0)
    ap.add_argument("--pp_stages", type=int, default=0)
    ap.add_argument("--pp_data", type=int, default=1)
    args = ap.parse_args()

    # CPU fleet arrangement must precede backend init (tests/conftest.py
    # recipe); the parent strips the TPU tunnel from the environment.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lpdnet_tpu.parallel.multiprocess import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == args.num_processes * args.local_devices
    try:
        run(args.log_dir, args.model_devices, args.max_epoch, args.resume,
            args.lr, args.checkpoint_every_steps, args.kill_after,
            args.pp_stages, args.pp_data)
    except RuntimeError as e:
        if not (args.kill_after and "simulated crash" in str(e)):
            raise
        # Orderly simulated crash: what the kill-and-resume test exercises
        # is resume-from-committed-disk-state, not unclean-teardown
        # semantics. Grace-sleep so the in-flight async Orbax commit (a
        # cross-process barrier on its background thread) can finalize,
        # then shut the distributed client down so the coordinator process
        # doesn't linger waiting for an abruptly-dead peer.
        import time

        print(f"worker {args.process_id} simulated crash", flush=True)
        time.sleep(5)
        jax.distributed.shutdown()
        sys.exit(7)
    print(f"worker {args.process_id} done", flush=True)


if __name__ == "__main__":
    main()
