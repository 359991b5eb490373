"""Serving: a device-resident descriptor index for online place recognition.

The reference stops at offline evaluation (SURVEY C18); a production
deployment needs the same two primitives online: embed incoming submaps and
retrieve nearest database descriptors. ``DescriptorIndex`` keeps the
database matrix on device, embeds queries through the jitted forward
(padded to a fixed batch so one compilation serves all traffic), and runs
retrieval as an MXU matmul + top-k — no host KDTree.

Example:
  model, variables = init_model(cfg.model, jax.random.key(0))
  index = DescriptorIndex(make_embed_fn(model), variables)
  index.build(database_clouds)           # (M, N, 3) or iterable of batches
  idx, sqd = index.query(query_clouds, k=5)
  index.save("index.npz"); index2 = DescriptorIndex.restore(...)
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Iterable, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from lpdnet_tpu.eval.recall import knn_retrieve
from lpdnet_tpu.utils.pipeline import pad_batch, pipelined_embed
from lpdnet_tpu.utils.wire import encode_points


class DescriptorIndex:
    """Embeds submaps and serves top-k retrieval over the database."""

    def __init__(
        self,
        embed_fn: Callable,
        variables,
        batch_size: int = 32,
        transfer_dtype: str = "int8",
    ):
        self.embed_fn = embed_fn
        self.variables = variables
        self.batch_size = batch_size
        # Wire format for submap uploads (utils/wire.py): int8 fixed-point
        # quarters transfer; measured retrieval-neutral (full-scale
        # descriptor cosine >= 0.99999 — PERF_LOG round 3).
        self.transfer_dtype = transfer_dtype
        self._db: Optional[jnp.ndarray] = None  # (M, D) on device
        self.names: Optional[list] = None  # row -> submap file (load())

    # -- embedding ---------------------------------------------------------
    def _encoded_batches(
        self, clouds: Union[np.ndarray, Iterable[np.ndarray]]
    ):
        """Yield (wire-encoded padded batch, true count) pairs from one
        array or a stream of arrays, re-chunked to the fixed serving batch
        so the compiled program is reused. Array chunks need not be
        batch-size multiples: each chunk's short tail is padded and its
        valid rows stay a prefix, which the pipeline slices per batch."""
        bs = self.batch_size
        chunks = [clouds] if isinstance(clouds, np.ndarray) else clouds
        for chunk in chunks:
            for start in range(0, len(chunk), bs):
                part = chunk[start : start + bs]
                yield encode_points(
                    pad_batch(part, bs), self.transfer_dtype
                ), len(part)

    def embed(
        self, clouds: Union[np.ndarray, Iterable[np.ndarray]]
    ) -> np.ndarray:
        """(B, N, C) array or stream of such arrays -> (B, D) descriptors,
        with a deep dispatch pipeline (uploads, compute, and downloads
        overlap across the in-flight window — one pipeline even for a
        streamed directory, so batches never serialize on the tunnel RTT).
        An empty input returns an empty (0, 0) array."""
        return pipelined_embed(
            self.embed_fn, self.variables, self._encoded_batches(clouds)
        )

    # -- database ----------------------------------------------------------
    def build(
        self, clouds: Union[np.ndarray, Iterable[np.ndarray]]
    ) -> int:
        """Embed the database submaps and keep descriptors on device."""
        self._db = jnp.asarray(self.embed(clouds))
        return int(self._db.shape[0])

    def add(self, clouds: np.ndarray) -> int:
        """Append submaps to the database (incremental mapping)."""
        vecs = jnp.asarray(self.embed(clouds))
        self._db = vecs if self._db is None else jnp.concatenate(
            [self._db, vecs], axis=0
        )
        return int(self._db.shape[0])

    @property
    def size(self) -> int:
        return 0 if self._db is None else int(self._db.shape[0])

    # -- retrieval ---------------------------------------------------------
    def query(
        self, clouds: Union[np.ndarray, Iterable[np.ndarray]], k: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, N, C) query submaps (array or stream of arrays) -> (B, k)
        database indices + squared distances, nearest first."""
        if self._db is None:
            raise RuntimeError("index is empty; call build() first")
        return self.query_descriptors(self.embed(clouds), k=k)

    def query_descriptors(
        self, descriptors: np.ndarray, k: int = 1, chunk: int = 1024
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve for already-embedded descriptors.

        Queries are dispatched in ``chunk``-row slices: retrieval
        materializes a (chunk, db_size) distance tile on device, so an
        unchunked 100k-query sweep against a large map would blow HBM.
        All slices dispatch before the first sync (round-trips overlap)."""
        if self._db is None:
            raise RuntimeError("index is empty; call build() first")
        kk = min(k, self.size)
        futs = []
        for s in range(0, len(descriptors), chunk):
            part = knn_retrieve(
                self._db, jnp.asarray(descriptors[s : s + chunk]), kk
            )
            for f in part:
                try:
                    f.copy_to_host_async()
                except AttributeError:
                    pass
            futs.append(part)
        if not futs:
            d = 0 if self._db is None else kk
            return (np.zeros((0, d), np.int32), np.zeros((0, d), np.float32))
        idx = np.concatenate([np.asarray(i) for i, _ in futs], axis=0)
        sqd = np.concatenate([np.asarray(s) for _, s in futs], axis=0)
        return idx, sqd

    # -- persistence -------------------------------------------------------
    def save(self, path: str, names: Optional[list] = None) -> None:
        """Persist the database matrix (and, optionally, the submap file
        names the rows came from — restored into ``self.names``)."""
        if self._db is None:
            raise RuntimeError("index is empty")
        arrays = {"database": np.asarray(self._db)}
        if names is not None:
            if len(names) != self.size:
                raise ValueError(
                    f"{len(names)} names for {self.size} database rows"
                )
            arrays["names"] = np.asarray(names, dtype=np.str_)
        np.savez_compressed(path, **arrays)

    def load(self, path: str) -> int:
        data = np.load(path)
        self._db = jnp.asarray(data["database"])
        self.names = (
            [str(s) for s in data["names"]] if "names" in data else None
        )
        return self.size


# ---------------------------------------------------------------------------
# CLI: build an index from a directory of .bin submaps and query it —
# the online counterpart of evaluate.py's offline benchmark (config and
# checkpoint restore mirror evaluate.py's).
# ---------------------------------------------------------------------------


def _list_bins(root: str) -> list:
    import glob as globlib

    names = sorted(
        globlib.glob(os.path.join(root, "**", "*.bin"), recursive=True)
    )
    if not names:
        raise SystemExit(f"no .bin submaps under {root}")
    return names


def _cloud_batches(
    names: list, num_points: int, batch_size: int
) -> Iterable[np.ndarray]:
    """Stream (<=batch_size, N, C) arrays so a large map directory never
    materializes in host memory at once. The CLI globs absolute paths, so
    the loader's dataset_folder stays empty."""
    from lpdnet_tpu.data.binio import load_pc_files

    for start in range(0, len(names), batch_size):
        yield load_pc_files(names[start : start + batch_size], "", num_points)


def main(argv=None) -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="Online serving: build/query a descriptor index."
    )
    ap.add_argument("--log_dir", required=True,
                    help="training log dir (config.json + checkpoints/)")
    ap.add_argument("--torch_checkpoint", default=None,
                    help="serve an imported reference torch checkpoint "
                         "instead of the log dir's latest")
    ap.add_argument("--index", required=True,
                    help="index file (.npz): written by --build_dir, read "
                         "for --query_dir")
    ap.add_argument("--build_dir", default=None,
                    help="build the index from every .bin under this dir")
    ap.add_argument("--query_dir", default=None,
                    help="query the index with every .bin under this dir")
    ap.add_argument("-k", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args(argv)
    if not args.build_dir and not args.query_dir:
        ap.error("nothing to do: pass --build_dir and/or --query_dir")

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_embed_fn
    from lpdnet_tpu.utils.checkpoint import CheckpointManager, load_config

    cfg = load_config(args.log_dir)
    if cfg is None:
        raise SystemExit(
            f"no config.json under {args.log_dir} — serve needs the "
            "training run's saved config"
        )
    model, state = create_train_state(cfg.model, cfg.train, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.torch_checkpoint:
        from lpdnet_tpu.utils.import_torch import load_torch_checkpoint

        variables = load_torch_checkpoint(args.torch_checkpoint, cfg.model)
    else:
        ckpt_dir = f"{args.log_dir}/checkpoints"
        restored = False
        if os.path.isdir(ckpt_dir):
            mgr = CheckpointManager(ckpt_dir)
            if mgr.latest_epoch() is not None:
                state, epoch = mgr.restore(state)
                print(f"restored checkpoint from epoch {epoch}",
                      file=sys.stderr)
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                restored = True
            mgr.close()
        if not restored:
            # Mirror evaluate.py: never silently serve random weights.
            print(
                f"warning: no checkpoint under {ckpt_dir}; serving the "
                "RANDOM INIT — retrieval results are meaningless",
                file=sys.stderr,
            )

    index = DescriptorIndex(
        make_embed_fn(model), variables, batch_size=args.batch_size,
        transfer_dtype=cfg.eval.transfer_dtype,
    )

    if args.build_dir:
        names = _list_bins(args.build_dir)
        n = index.build(
            _cloud_batches(names, cfg.data.num_points, args.batch_size)
        )
        index.save(args.index, names=names)
        index.names = names  # the device-resident copy serves --query_dir
        print(f"indexed {n} submaps -> {args.index}", file=sys.stderr)

    if args.query_dir:
        if not args.build_dir:
            index.load(args.index)  # the database matrix + row names
        qnames = _list_bins(args.query_dir)
        db_names = index.names or [str(i) for i in range(index.size)]
        # One streamed embed pipeline over every query file, one retrieval
        # dispatch; only the (Nq, D) descriptors stay resident.
        idx, sqd = index.query(
            _cloud_batches(qnames, cfg.data.num_points, args.batch_size),
            k=args.k,
        )
        for qi, qname in enumerate(qnames):
            print(json.dumps({
                "query": qname,
                "neighbors": [
                    {"file": db_names[int(j)], "index": int(j),
                     "sq_dist": float(d)}
                    for j, d in zip(idx[qi], sqd[qi])
                ],
            }))


if __name__ == "__main__":
    main()
