#!/usr/bin/env python
"""Training CLI (reference: ``python train_pointnetvlad.py --dataset_folder ...``
— SURVEY C15, L3 driver layer).

Examples:
  python train.py --preset baseline --dataset_folder benchmark_datasets
  python train.py --preset lpd_baseline --max_epoch 30 --resume
  python train.py --preset refine --trunk lpdnet
  python train.py --synthetic            # no dataset needed: synthetic smoke
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from lpdnet_tpu.configs import PRESETS, apply_overrides
from lpdnet_tpu.data.binio import load_pc_file
from lpdnet_tpu.data.pickles import (
    get_queries_dict,
    get_sets_dict,
    resolve_artifact,
)
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.train.loop import TrainResources, train
from lpdnet_tpu.utils.logging import MetricsLogger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="baseline", choices=sorted(PRESETS))
    p.add_argument("--trunk", default=None, choices=["pointnetvlad", "lpdnet"])
    p.add_argument("--dataset_folder", default=None)
    p.add_argument("--train_file", default=None)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--batch_num_queries", type=int, default=None)
    p.add_argument("--positives_per_query", type=int, default=None)
    p.add_argument("--negatives_per_query", type=int, default=None)
    p.add_argument("--num_points", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--margin_1", type=float, default=None)
    p.add_argument("--margin_2", type=float, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no_mesh", action="store_true",
                   help="single-device (skip mesh sharding)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--model_devices", type=int, default=None,
                   help="tensor-parallel width: shard the NetVLAD head over "
                        "a 'model' mesh axis this wide (2-D (data, model) "
                        "mesh; num_clusters must divide by it)")
    p.add_argument("--batch_scaling", default=None,
                   choices=["per_device", "fit"],
                   help="per_device: global batch = batch_num_queries x mesh "
                        "size; fit: shrink the mesh to divide the batch")
    p.add_argument("--pp_stages", type=int, default=None,
                   help="pipeline-parallel stage count (1-4): GPipe over a "
                        "'stage' mesh (parallel/pp.py); exclusive with "
                        "--model_devices and multi-process runs")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="microbatch count for the pipelined step "
                        "(default: auto)")
    p.add_argument("--pp_data", type=int, default=None,
                   help="DPxPP: data-parallel pipeline replicas over a 2-D "
                        "(data, stage) mesh (needs pp_stages x pp_data "
                        "devices)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                   help="activation/matmul compute dtype")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (traps the first NaN)")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror metrics as tensorboard scalars (log_dir/tb)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic clustered dataset (smoke)")
    p.add_argument("--synthetic_scale", default="small",
                   choices=["small", "full"],
                   help="small: 256-pt tiny model smoke; full: 4096-pt "
                        "full-size model dress rehearsal")
    p.add_argument("--synthetic_world", default="clustered",
                   choices=["clustered", "hard", "ground"],
                   help="synthetic world family (data/synthetic.py): "
                        "'clustered' = the easy smoke world; 'hard' = "
                        "family-ambiguous places + occluded noisy views "
                        "(discriminating audits); 'ground' = hard + a "
                        "coplanar ground sheet (LiDAR-like geometry)")
    p.add_argument("--synthetic_families", type=int, default=8,
                   help="family-template count for the hard/ground worlds "
                        "(fewer = more inter-place ambiguity)")
    p.add_argument("--eval_database_file", default=None)
    p.add_argument("--eval_query_file", default=None)
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        dest="overrides",
        help="dotted-path config override, e.g. --set model.feature_dim=256 "
             "--set train.mining.warmup_epochs=3 (applies after the "
             "dedicated flags; values parse as JSON, else strings)",
    )
    from lpdnet_tpu.parallel.multiprocess import add_cli_args

    add_cli_args(p)
    return p.parse_args()


def main():
    from lpdnet_tpu.utils.cache import enable_compilation_cache

    args = parse_args()
    # Distributed bootstrap must precede any JAX backend use (including the
    # compilation cache); afterwards jax.devices() is the global pod.
    from lpdnet_tpu.parallel.multiprocess import initialize_from_args

    initialize_from_args(args)
    enable_compilation_cache()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = PRESETS[args.preset]()

    over = {}
    if args.trunk: over["model.trunk"] = args.trunk
    if args.dataset_folder: over["data.dataset_folder"] = args.dataset_folder
    if args.train_file: over["data.train_file"] = args.train_file
    if args.eval_database_file: over["data.eval_database_file"] = args.eval_database_file
    if args.eval_query_file: over["data.eval_query_file"] = args.eval_query_file
    if args.log_dir: over["train.log_dir"] = args.log_dir
    if args.max_epoch is not None: over["train.max_epoch"] = args.max_epoch
    if args.batch_num_queries is not None:
        over["train.batch_num_queries"] = args.batch_num_queries
    if args.positives_per_query is not None:
        over["train.positives_per_query"] = args.positives_per_query
    if args.negatives_per_query is not None:
        over["train.negatives_per_query"] = args.negatives_per_query
    if args.num_points is not None:
        over["data.num_points"] = args.num_points
        over["model.num_points"] = args.num_points
    if args.learning_rate is not None:
        over["train.base_learning_rate"] = args.learning_rate
    if args.margin_1 is not None: over["train.loss.margin_1"] = args.margin_1
    if args.margin_2 is not None: over["train.loss.margin_2"] = args.margin_2
    if args.resume: over["train.resume"] = True
    if args.seed is not None: over["train.seed"] = args.seed
    if args.num_devices is not None: over["mesh.num_devices"] = args.num_devices
    if args.model_devices is not None:
        over["mesh.model_devices"] = args.model_devices
    if args.batch_scaling: over["mesh.batch_scaling"] = args.batch_scaling
    if args.pp_stages is not None:
        over["mesh.pipeline_stages"] = args.pp_stages
    if args.pp_microbatches is not None:
        over["mesh.pipeline_microbatches"] = args.pp_microbatches
    if args.pp_data is not None:
        over["mesh.pipeline_data_replicas"] = args.pp_data
    if args.dtype: over["model.compute_dtype"] = args.dtype
    from lpdnet_tpu.configs import parse_override_value

    for kv in args.overrides:
        key, eq, val = kv.partition("=")
        if not eq:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        over[key] = parse_override_value(val)
    cfg = apply_overrides(cfg, **over)

    if args.synthetic:
        if args.synthetic_scale == "small":
            small = {
                "model.feature_dim": 128,
                "model.num_clusters": 16, "model.output_dim": 64,
                "model.use_input_transform": False,
                "train.batch_num_queries": 4,
                "train.negatives_per_query": 6,
                "train.base_learning_rate": 1e-3,
                "train.mining.warmup_epochs": 1,
            }
            if args.num_points is None:
                small["model.num_points"] = 256
            cfg = apply_overrides(cfg, **small)
            places, submaps = 16, 8
        else:
            # Full-size dress rehearsal: reference model dims + tuple sizes
            # on 4096-pt synthetic submaps.
            cfg = apply_overrides(
                cfg,
                **{
                    "train.base_learning_rate": 5e-4,
                    "train.mining.warmup_epochs": 1,
                    "train.mining.cache_refresh_queries": 400,
                },
            )
            places, submaps = 64, 10
        ds = make_synthetic_dataset(
            num_places=places, submaps_per_place=submaps,
            num_points=cfg.model.num_points, seed=cfg.train.seed,
            world=args.synthetic_world,
            num_families=args.synthetic_families,
        )
        res = TrainResources(
            sampler=TupleSampler(
                ds.queries, ds.loader,
                num_pos=cfg.train.positives_per_query,
                num_neg=cfg.train.negatives_per_query,
            ),
            loader=ds.loader,
            database_sets=ds.database_sets,
            query_sets=ds.query_sets,
        )
    else:
        queries = get_queries_dict(
            os.path.join(cfg.data.dataset_folder, cfg.data.train_file)
            if not os.path.exists(cfg.data.train_file) else cfg.data.train_file
        )

        def loader(fname: str) -> np.ndarray:
            return load_pc_file(
                fname, cfg.data.dataset_folder, cfg.data.num_points
            )

        def resolve(path: str) -> str:
            return resolve_artifact(path, cfg.data.dataset_folder)

        db_sets = q_sets = None
        db_path = resolve(cfg.data.eval_database_file)
        if os.path.exists(db_path):
            db_sets = get_sets_dict(db_path)
            q_sets = get_sets_dict(resolve(cfg.data.eval_query_file))
        # Held-out validation tuples (reference TEST_FILE — the loop logs
        # a per-epoch validation loss when the pickle exists).
        val_sampler = None
        test_path = resolve(cfg.data.test_file)
        if os.path.exists(test_path):
            val_sampler = TupleSampler(
                get_queries_dict(test_path), loader,
                num_pos=cfg.train.positives_per_query,
                num_neg=cfg.train.negatives_per_query,
            )
        res = TrainResources(
            sampler=TupleSampler(
                queries, loader,
                num_pos=cfg.train.positives_per_query,
                num_neg=cfg.train.negatives_per_query,
            ),
            loader=loader,
            database_sets=db_sets,
            query_sets=q_sets,
            val_sampler=val_sampler,
        )

    logger = MetricsLogger(cfg.train.log_dir, tensorboard=args.tensorboard)
    out = train(cfg, res, use_mesh=not args.no_mesh, logger=logger)
    if out["eval"]:
        print(
            f"final ave recall@1%: {out['eval']['ave_one_percent_recall']:.2f}"
        )


if __name__ == "__main__":
    main()
