"""Epoch driver: the reference's ``train()`` / ``train_one_epoch()`` rebuilt
around a jitted, mesh-sharded step (reference: ``train_pointnetvlad.py`` —
SURVEY C15, call stack §3.1).

Per epoch: shuffled tuple batches (skipping queries with too few positives),
host-side tuple assembly + augmentation, one compiled train step per batch;
after the warm-up epochs, hard negatives are mixed in and the descriptor
cache refreshes every ``cache_refresh_queries`` processed queries (§3.5).
Checkpoints via Orbax per epoch; metrics as JSONL; optional per-epoch eval.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import numpy as np

from lpdnet_tpu.configs import Config
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.eval.evaluate import evaluate_model, write_results
from lpdnet_tpu.parallel.mesh import (
    fitting_device_count, make_mesh, replicate, shard_batch,
)
from lpdnet_tpu.train.mining import DescriptorCache
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import (
    make_embed_fn, make_embed_many_fn, make_train_step,
)
from lpdnet_tpu.utils.checkpoint import CheckpointManager, save_config
from lpdnet_tpu.utils.logging import MetricsLogger
from lpdnet_tpu.utils.pipeline import prefetch_iterator


@dataclasses.dataclass
class TrainResources:
    """Everything the loop needs beyond the config (injectable for tests)."""

    sampler: TupleSampler
    loader: Callable[[str], np.ndarray]
    database_sets: Optional[list] = None
    query_sets: Optional[list] = None


def train(
    cfg: Config,
    res: TrainResources,
    use_mesh: bool = True,
    logger: Optional[MetricsLogger] = None,
) -> Dict[str, object]:
    """Run training; returns final state + last eval results."""
    tc = cfg.train
    logger = logger or MetricsLogger(tc.log_dir)
    save_config(cfg, tc.log_dir)

    mesh = None
    global_batch = tc.batch_num_queries
    if use_mesh:
        avail = cfg.mesh.num_devices or len(jax.devices())
        if cfg.mesh.batch_scaling == "per_device":
            # Each device carries batch_num_queries queries: the global
            # batch scales with the mesh and no chip idles. The mesh must
            # still divide the eval/mining embed batch.
            ndev = fitting_device_count(avail, cfg.eval.batch_size)
            global_batch = tc.batch_num_queries * ndev
        else:
            # 'fit': the batch axis shards over the mesh, so the mesh size
            # must divide batch_num_queries; with more devices than that,
            # use the largest divisor (the reference's DataParallel
            # silently idles extra GPUs the same way).
            ndev = fitting_device_count(
                avail, tc.batch_num_queries, cfg.eval.batch_size
            )
        if ndev != avail:
            logger.log(
                "mesh_shrunk", requested=avail, used=ndev,
                batch_num_queries=tc.batch_num_queries,
            )
        logger.log(
            "mesh", devices=ndev, scaling=cfg.mesh.batch_scaling,
            global_batch_queries=global_batch,
        )
        mesh = make_mesh(ndev, cfg.mesh.data_axis)

    model, state = create_train_state(
        cfg.model, tc, jax.random.key(tc.seed),
        examples_per_step=global_batch,
    )
    train_step = make_train_step(
        model, tc.loss, mesh=mesh, data_axis=cfg.mesh.data_axis
    )
    embed_fn = make_embed_fn(model, mesh=mesh, data_axis=cfg.mesh.data_axis)
    # Scan-chunked sweep variant: opt-in for fast-DMA hosts
    # (EvalConfig.sweep_chunk > 1); per-batch pipelining otherwise.
    embed_many_fn = (
        make_embed_many_fn(model, mesh=mesh, data_axis=cfg.mesh.data_axis)
        if cfg.eval.sweep_chunk > 1 else None
    )

    ckpt = CheckpointManager(
        f"{tc.log_dir}/checkpoints", keep=tc.keep_checkpoints
    )
    start_epoch = 0
    if tc.resume and ckpt.latest_epoch() is not None:
        state, start_epoch = ckpt.restore(state)
        start_epoch += 1
        logger.log("resume", epoch=start_epoch)

    if mesh is not None:
        state = replicate(state, mesh)

    cache = DescriptorCache(res.sampler, batch_size=cfg.eval.batch_size)
    mining = tc.mining
    results: Dict[str, object] = {}

    def model_vars(s):
        return {"params": s.params, "batch_stats": s.batch_stats}

    for epoch in range(start_epoch, tc.max_epoch):
        # Deterministic data order keyed by (seed, epoch): resuming from a
        # checkpoint replays the exact remaining schedule (SURVEY §5
        # failure-recovery row).
        rng_np = np.random.RandomState(
            (tc.seed * 1_000_003 + epoch) % (2**31 - 1)
        )
        use_hard = epoch >= mining.warmup_epochs
        if use_hard and not cache.ready:
            cache.refresh(
                embed_fn, model_vars(state), embed_many_fn=embed_many_fn,
                chunk=cfg.eval.sweep_chunk,
                transfer_dtype=cfg.eval.transfer_dtype,
            )
            logger.log("mining_cache_refresh", epoch=epoch, queries=0)

        def hard_fn(idx: int):
            if not (use_hard and cache.ready):
                return ()
            return cache.hard_negatives(
                idx,
                mining.hard_negatives_per_query,
                rng_np,
                sampled_pool=mining.sampled_negatives,
            )

        losses = []
        queries_done = 0
        next_refresh = mining.cache_refresh_queries
        # Tuple building/augmentation overlaps the device step — the
        # reference assembles tuples synchronously inside its hot loop
        # (SURVEY §3.1 "CPU HOT SPOT").
        batches = prefetch_iterator(
            res.sampler.epoch_batches(
                global_batch,
                rng_np,
                hard_negs_fn=hard_fn if use_hard else None,
                rotate=cfg.data.augment_rotate,
                jitter=cfg.data.augment_jitter,
                rotation_max_deg=cfg.data.rotation_max_deg,
                jitter_sigma=cfg.data.jitter_sigma,
                jitter_clip=cfg.data.jitter_clip,
            )
        )
        for ids, batch in batches:
            if mesh is not None:
                batch = shard_batch(batch, mesh, cfg.mesh.data_axis)
            state, loss = train_step(state, batch)
            losses.append(loss)
            queries_done += len(ids)
            if use_hard and queries_done >= next_refresh:
                cache.refresh(
                    embed_fn, model_vars(state),
                    embed_many_fn=embed_many_fn,
                    chunk=cfg.eval.sweep_chunk,
                    transfer_dtype=cfg.eval.transfer_dtype,
                )
                next_refresh += mining.cache_refresh_queries
                logger.log(
                    "mining_cache_refresh", epoch=epoch, queries=queries_done
                )

        epoch_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        logger.log(
            "epoch", epoch=epoch, loss=epoch_loss,
            steps=len(losses), queries=queries_done,
        )

        if (epoch + 1) % tc.checkpoint_every_epochs == 0:
            ckpt.save(epoch, jax.device_get(state))

        if (
            res.database_sets is not None
            and (epoch + 1) % tc.eval_every_epochs == 0
        ):
            results = evaluate_model(
                embed_fn,
                model_vars(state),
                res.database_sets,
                res.query_sets,
                res.loader,
                batch_size=cfg.eval.batch_size,
                num_neighbors=cfg.eval.top_k,
                embed_many_fn=embed_many_fn,
                chunk=cfg.eval.sweep_chunk,
                transfer_dtype=cfg.eval.transfer_dtype,
            )
            logger.log(
                "eval",
                epoch=epoch,
                one_percent_recall=results["ave_one_percent_recall"],
                recall_at_1=float(np.asarray(results["ave_recall"])[0]),
            )
            write_results(results, f"{tc.log_dir}/{cfg.eval.output_file}")

    ckpt.close()
    return {"state": jax.device_get(state), "eval": results, "model": model}
