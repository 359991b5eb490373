"""Training-query / evaluation-set pickle IO.

Reference: ``get_queries_dict`` / ``get_sets_dict`` in
``loading_pointclouds.py`` (SURVEY C2). Formats (SURVEY C2/C7-C9):

  * training queries: ``{idx: {'query': relpath, 'positives': [idx...],
    'negatives': [idx...]}}``
  * evaluation sets: a list with one dict per run:
    ``[{idx: {'query': relpath, 'northing': float, 'easting': float,
    <run m>: [true-positive idxs]}}, ...]``
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List


def get_queries_dict(filename: str) -> Dict[int, Dict[str, Any]]:
    """Load a training/test query dict pickle (reference layout)."""
    with open(filename, "rb") as f:
        queries = pickle.load(f)
    return queries


def get_sets_dict(filename: str) -> List[Dict[int, Dict[str, Any]]]:
    """Load an evaluation database/query set-list pickle (reference layout)."""
    with open(filename, "rb") as f:
        sets = pickle.load(f)
    return sets


def resolve_artifact(path: str, dataset_folder: str) -> str:
    """Eval/training pickles may sit in the CWD or the dataset folder."""
    import os

    if os.path.isfile(path):
        return path
    return os.path.join(dataset_folder, path)


def save_pickle(obj: Any, filename: str) -> None:
    with open(filename, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
