"""Offline 13-D feature preparation.

Reference: the per-submap NumPy eigen-feature prep (SURVEY C4) that turns
``(4096, 3)`` xyz submaps into ``(4096, 13)`` feature-augmented files. Here
the whole corpus streams through the batched device op
(``lpdnet_tpu.ops.features.eigen_features``, exact-k oracle path) in fixed-
size batches — thousands of submaps per minute instead of seconds per
submap.

The on-device feature stage (``compute_features_on_device=True``) makes this
offline step optional; it exists for parity with the reference's data
artifacts and for feeding precomputed-13D training.

Usage:
  python -m lpdnet_tpu.data.prepare_features \
      --dataset_folder benchmark_datasets --out_folder benchmark_13d \
      [--files file_list.txt] [--k 20] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, List, Sequence

import numpy as np

from lpdnet_tpu.data.binio import load_pc_file, save_pc_file


def find_bin_files(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".bin"):
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), root)
                )
    return sorted(out)


def _batches(items: Sequence[str], size: int) -> Iterator[Sequence[str]]:
    for start in range(0, len(items), size):
        yield items[start : start + size]


def prepare_features(
    dataset_folder: str,
    out_folder: str,
    files: Sequence[str],
    k: int = 20,
    batch: int = 32,
    num_points: int = 4096,
) -> int:
    import jax.numpy as jnp

    from lpdnet_tpu.ops.features import eigen_features

    done = 0
    for chunk in _batches(files, batch):
        pts = np.stack([
            load_pc_file(f, dataset_folder, num_points) for f in chunk
        ])
        if pts.shape[-1] != 3:
            raise ValueError(
                f"expected (N, 3) inputs, got {pts.shape} for {chunk[0]}"
            )
        pad = batch - len(chunk)
        if pad:
            pts = np.concatenate([pts, np.repeat(pts[-1:], pad, 0)])
        feats = np.asarray(eigen_features(jnp.asarray(pts), k))[: len(chunk)]
        aug = np.concatenate([pts[: len(chunk)], feats], axis=-1)
        for f, a in zip(chunk, aug):
            save_pc_file(a, os.path.join(out_folder, f))
        done += len(chunk)
    return done


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_folder", required=True)
    p.add_argument("--out_folder", required=True)
    p.add_argument("--files", default=None,
                   help="text file listing relative .bin paths (default: walk)")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--num_points", type=int, default=4096)
    args = p.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.files:
        with open(args.files) as f:
            files = [line.strip() for line in f if line.strip()]
    else:
        files = find_bin_files(args.dataset_folder)
    print(f"preparing {len(files)} submaps (k={args.k})")
    done = prepare_features(
        args.dataset_folder, args.out_folder, files,
        k=args.k, batch=args.batch, num_points=args.num_points,
    )
    print(f"wrote {done} feature-augmented submaps to {args.out_folder}")


if __name__ == "__main__":
    main()
