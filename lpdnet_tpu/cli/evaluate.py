#!/usr/bin/env python
"""Evaluation CLI (reference: ``python evaluate.py`` — SURVEY C18).

Loads a checkpoint, embeds all database/query runs, and writes the averaged
recall@1..25 / top-1% report in the reference's text format.

Examples:
  python evaluate.py --log_dir log --dataset_folder benchmark_datasets
  python evaluate.py --synthetic --log_dir log   # synthetic smoke eval
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from lpdnet_tpu.configs import PRESETS, apply_overrides
from lpdnet_tpu.data.binio import load_pc_file
from lpdnet_tpu.data.pickles import get_sets_dict, resolve_artifact
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.eval.evaluate import (
    evaluate_model,
    format_results,
    report_path,
    write_results,
)
from lpdnet_tpu.parallel.mesh import fitting_device_count, make_mesh
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_embed_fn, make_embed_many_fn
from lpdnet_tpu.utils.checkpoint import CheckpointManager


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="baseline", choices=sorted(PRESETS))
    p.add_argument("--trunk", default=None, choices=["pointnetvlad", "lpdnet"])
    p.add_argument("--dataset_folder", default=None)
    p.add_argument("--log_dir", default="log")
    p.add_argument("--eval_database_file", default=None)
    p.add_argument("--eval_query_file", default=None)
    p.add_argument("--output_file", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_points", type=int, default=None)
    p.add_argument("--no_mesh", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_world", default="clustered",
                   choices=["clustered", "hard", "ground"],
                   help="synthetic world family (data/synthetic.py)")
    p.add_argument("--synthetic_families", type=int, default=8)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--exact_knn", action="store_true",
                   help="exact top_k selection (fidelity audit; slow)")
    p.add_argument("--best", action="store_true",
                   help="restore the best-by-eval checkpoint "
                        "(checkpoints_best/) instead of the latest")
    p.add_argument("--torch_checkpoint", default=None,
                   help="import a reference torch checkpoint (state_dict "
                        "or {'epoch','state_dict','optimizer'} wrapper) "
                        "instead of an Orbax checkpoint")
    p.add_argument(
        "--all_sets", action="store_true",
        help="evaluate all four benchmark sets (oxford + university + "
             "residential + business) from <set>_evaluation_*.pickle in "
             "the dataset folder (the reference's refined-stage eval)",
    )
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        dest="overrides",
        help="dotted-path config override, e.g. --set eval.batch_size=32 "
             "(applies after the dedicated flags; values parse as JSON, "
             "else strings)",
    )
    from lpdnet_tpu.parallel.multiprocess import add_cli_args

    add_cli_args(p)
    return p.parse_args()


def main():
    from lpdnet_tpu.utils.cache import enable_compilation_cache

    args = parse_args()
    from lpdnet_tpu.parallel.multiprocess import initialize_from_args

    initialize_from_args(args)
    enable_compilation_cache()
    from lpdnet_tpu.utils.checkpoint import load_config

    cfg = load_config(args.log_dir)
    if cfg is not None:
        print(f"loaded config from {args.log_dir}/config.json")
    else:
        cfg = PRESETS[args.preset]()
    over = {"train.log_dir": args.log_dir}
    if args.trunk: over["model.trunk"] = args.trunk
    if args.dataset_folder: over["data.dataset_folder"] = args.dataset_folder
    if args.eval_database_file:
        over["data.eval_database_file"] = args.eval_database_file
    if args.eval_query_file: over["data.eval_query_file"] = args.eval_query_file
    if args.output_file: over["eval.output_file"] = args.output_file
    if args.batch_size is not None: over["eval.batch_size"] = args.batch_size
    if args.num_points is not None:
        over["data.num_points"] = args.num_points
        over["model.num_points"] = args.num_points
    if args.dtype: over["model.compute_dtype"] = args.dtype
    if args.exact_knn: over["model.exact_knn"] = True
    from lpdnet_tpu.configs import parse_override_value

    for kv in args.overrides:
        key, eq, val = kv.partition("=")
        if not eq:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        over[key] = parse_override_value(val)
    cfg = apply_overrides(cfg, **over)

    if args.synthetic:
        if not os.path.isfile(os.path.join(args.log_dir, "config.json")):
            cfg = apply_overrides(
                cfg,
                **{
                    "model.num_points": 256, "model.feature_dim": 128,
                    "model.num_clusters": 16, "model.output_dim": 64,
                    "model.use_input_transform": False,
                },
            )
        ds = make_synthetic_dataset(
            num_places=16, submaps_per_place=8,
            num_points=cfg.model.num_points,
            world=args.synthetic_world,
            num_families=args.synthetic_families,
        )
        database_sets, query_sets, loader = (
            ds.database_sets, ds.query_sets, ds.loader
        )
    else:
        def resolve(path: str) -> str:
            return resolve_artifact(path, cfg.data.dataset_folder)

        database_sets = query_sets = None
        if not args.all_sets:
            database_sets = get_sets_dict(resolve(cfg.data.eval_database_file))
            query_sets = get_sets_dict(resolve(cfg.data.eval_query_file))

        def loader(fname: str) -> np.ndarray:
            return load_pc_file(
                fname, cfg.data.dataset_folder, cfg.data.num_points
            )

        from lpdnet_tpu.data.native_loader import NativeBatchLoader

        # 3 columns for raw xyz corpora, 13 for precomputed-feature ones.
        dims = 3 if (
            cfg.model.compute_features_on_device or cfg.model.input_dim == 3
        ) else cfg.model.input_dim
        nbl = NativeBatchLoader(num_points=cfg.data.num_points, dims=dims)
        batch_loader = (
            (lambda names: nbl.load(names, cfg.data.dataset_folder))
            if nbl.is_native else None
        )

    model, state = create_train_state(
        cfg.model, cfg.train, jax.random.key(0)
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.torch_checkpoint:
        from lpdnet_tpu.utils.import_torch import load_torch_checkpoint

        variables = load_torch_checkpoint(args.torch_checkpoint, cfg.model)
        print(f"imported torch checkpoint {args.torch_checkpoint}")
    else:
        kind = "checkpoints_best" if args.best else "checkpoints"
        ckpt_dir = f"{cfg.train.log_dir}/{kind}"
        if os.path.isdir(ckpt_dir):
            mgr = CheckpointManager(ckpt_dir)
            if mgr.latest_epoch() is not None:
                state, epoch = mgr.restore(state)
                label = "best checkpoint" if args.best else "checkpoint"
                print(f"restored {label} from epoch {epoch}")
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
            mgr.close()
        else:
            print("warning: no checkpoint found; evaluating random init")

    mesh = None
    nproc = jax.process_count()
    primary = jax.process_index() == 0
    if nproc > 1 and args.no_mesh:
        raise ValueError("multi-process evaluation requires the mesh path")
    if not args.no_mesh:
        # The mesh must divide the eval batch (embed sweeps shard it).
        avail = cfg.mesh.num_devices or len(jax.devices())
        ndev = fitting_device_count(avail, cfg.eval.batch_size)
        if nproc > 1 and ndev != avail:
            raise ValueError(
                f"multi-process mesh must use all {avail} devices; "
                f"eval.batch_size={cfg.eval.batch_size} fits only {ndev}"
            )
        mesh = make_mesh(ndev)
    embed = make_embed_fn(model, mesh=mesh)
    embed_many = (
        make_embed_many_fn(model, mesh=mesh)
        if cfg.eval.sweep_chunk > 1 else None
    )
    sweep_rows = None
    if nproc > 1:
        # Each process loads/uploads only its rows of every padded batch
        # (parallel/multiprocess.py); results come back replicated.
        from lpdnet_tpu.parallel.multiprocess import (
            make_mp_sweep_embed_fn, sweep_local_rows,
        )

        sweep_rows = sweep_local_rows(mesh, "data", cfg.eval.batch_size)
        if sweep_rows is not None:
            embed = make_mp_sweep_embed_fn(
                embed, mesh, "data", cfg.eval.batch_size
            )
            embed_many = None

    if args.all_sets and not args.synthetic:
        for ds_name in ["oxford", "university", "residential", "business"]:
            db_path = os.path.join(
                cfg.data.dataset_folder, f"{ds_name}_evaluation_database.pickle"
            )
            q_path = os.path.join(
                cfg.data.dataset_folder, f"{ds_name}_evaluation_query.pickle"
            )
            if not (os.path.isfile(db_path) and os.path.isfile(q_path)):
                print(f"skipping {ds_name}: eval pickles not found")
                continue
            results = evaluate_model(
                embed, variables,
                get_sets_dict(db_path), get_sets_dict(q_path), loader,
                batch_size=cfg.eval.batch_size, num_neighbors=cfg.eval.top_k,
                batch_loader=batch_loader, embed_many_fn=embed_many,
                chunk=cfg.eval.sweep_chunk,
                transfer_dtype=cfg.eval.transfer_dtype,
                local_rows=sweep_rows,
            )
            if primary:
                print(f"=== {ds_name} ===")
                print(format_results(results))
                write_results(
                    results,
                    report_path(
                        cfg.train.log_dir, cfg.eval.output_file,
                        prefix=f"{ds_name}_",
                    ),
                )
        return

    results = evaluate_model(
        embed, variables, database_sets, query_sets, loader,
        batch_size=cfg.eval.batch_size, num_neighbors=cfg.eval.top_k,
        batch_loader=None if args.synthetic else batch_loader,
        embed_many_fn=embed_many,
        chunk=cfg.eval.sweep_chunk,
        transfer_dtype=cfg.eval.transfer_dtype,
        local_rows=sweep_rows,
    )
    if primary:
        print(format_results(results))
        write_results(
            results, report_path(cfg.train.log_dir, cfg.eval.output_file)
        )


if __name__ == "__main__":
    main()
