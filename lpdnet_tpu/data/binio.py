"""Point-cloud ``.bin`` file IO.

Reference: ``load_pc_file`` / ``load_pc_files`` in ``loading_pointclouds.py``
(SURVEY C3): files are raw float64 streams reshaping to ``(4096, 3)`` (xyz,
normalized submaps) or ``(4096, 13)`` (xyz + 10 handcrafted features).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def load_pc_file(
    filename: str,
    dataset_folder: str = "",
    num_points: int = 4096,
) -> np.ndarray:
    """Load one submap: raw float64 -> (num_points, 3|13) float32.

    Raises ValueError for a size that matches neither layout (the reference
    prints a warning and returns an empty array; we fail loudly).
    """
    path = os.path.join(dataset_folder, filename) if dataset_folder else filename
    pc = np.fromfile(path, dtype=np.float64)
    if pc.size == num_points * 3:
        pc = pc.reshape(num_points, 3)
    elif pc.size == num_points * 13:
        pc = pc.reshape(num_points, 13)
    else:
        raise ValueError(
            f"{path}: {pc.size} float64s matches neither ({num_points},3) "
            f"nor ({num_points},13)"
        )
    return pc.astype(np.float32)


def load_pc_files(
    filenames: Sequence[str],
    dataset_folder: str = "",
    num_points: int = 4096,
) -> np.ndarray:
    """Load a list of submaps -> (len(filenames), num_points, C) float32."""
    pcs: List[np.ndarray] = [
        load_pc_file(f, dataset_folder, num_points) for f in filenames
    ]
    return np.stack(pcs, axis=0)


def save_pc_file(points: np.ndarray, filename: str) -> None:
    """Write a submap in the reference's raw-float64 layout."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    np.ascontiguousarray(points, dtype=np.float64).tofile(filename)
