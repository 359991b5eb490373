"""Synthetic clustered place-recognition dataset.

SURVEY §4: the integration-test strategy is a tiny deterministic dataset of
"places" where recall@1 must reach 100% after a few training steps. Each
place is a random base point cloud; every submap of a place is a rotated,
jittered, subsampled view of the base. Distinct places are independent draws,
so descriptors must learn rotation-invariant geometry to separate them.

Produces artifacts in the exact reference layouts (SURVEY C2):
  * a training-queries dict (positives = same place, negatives = others);
  * evaluation database/query set lists with UTM-style coordinates and
    per-run true-positive lists;
  * an in-memory ``loader`` compatible with ``TupleSampler``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np


@dataclass
class SyntheticDataset:
    queries: Dict[int, Dict]  # reference training-dict layout
    clouds: Dict[str, np.ndarray]  # filename -> (N, 3)
    place_of: Dict[int, int]  # query idx -> place id
    database_sets: List[Dict[int, Dict]] = field(default_factory=list)
    query_sets: List[Dict[int, Dict]] = field(default_factory=list)

    def loader(self, filename: str) -> np.ndarray:
        return self.clouds[filename]


def _make_submap(
    base: np.ndarray, rng: np.random.RandomState, num_points: int
) -> np.ndarray:
    """A rotated + jittered + resampled view of a base cloud."""
    sel = rng.choice(base.shape[0], num_points, replace=True)
    pts = base[sel]
    ang = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    pts = pts @ rot.T
    pts = pts + rng.randn(*pts.shape).astype(np.float32) * 0.01
    return np.clip(pts, -1.0, 1.0).astype(np.float32)


def make_synthetic_dataset(
    num_places: int = 8,
    submaps_per_place: int = 6,
    num_points: int = 128,
    seed: int = 0,
    num_runs: int = 2,
) -> SyntheticDataset:
    """Build the dataset + eval sets.

    Eval sets: ``num_runs`` disjoint "runs"; each run holds one submap per
    place (database) and one fresh submap per place (queries), with
    synthetic UTM coordinates spacing places 100 m apart so the 25 m
    true-positive radius (SURVEY C9) groups only same-place submaps.
    """
    rng = np.random.RandomState(seed)

    def make_base() -> np.ndarray:
        """A place = a mixture of compact clusters at random 3-D offsets.

        Submaps are z-rotated views, so places must differ in rotation-
        invariant statistics (z-profile, radial distribution, cluster
        granularity) — isotropic Gaussian blobs would all look alike.
        """
        n_clusters = rng.randint(3, 8)
        centers = rng.uniform(-0.8, 0.8, size=(n_clusters, 3))
        scales = rng.uniform(0.02, 0.15, size=(n_clusters, 1))
        pts = []
        total = num_points * 4
        for ci in range(n_clusters):
            cnt = total // n_clusters
            pts.append(centers[ci] + rng.randn(cnt, 3) * scales[ci])
        return np.concatenate(pts).clip(-1, 1).astype(np.float32)

    bases = [make_base() for _ in range(num_places)]

    clouds: Dict[str, np.ndarray] = {}
    queries: Dict[int, Dict] = {}
    place_of: Dict[int, int] = {}
    idx = 0
    by_place: List[List[int]] = [[] for _ in range(num_places)]
    for p in range(num_places):
        for s in range(submaps_per_place):
            fname = f"place{p:03d}/sub{s:03d}.bin"
            clouds[fname] = _make_submap(bases[p], rng, num_points)
            by_place[p].append(idx)
            place_of[idx] = p
            idx += 1
    for i, p in place_of.items():
        queries[i] = {
            "query": f"place{p:03d}/sub{by_place[p].index(i):03d}.bin",
            "positives": [j for j in by_place[p] if j != i],
            "negatives": [j for j in range(idx) if place_of[j] != p],
        }

    # Evaluation runs.
    database_sets: List[Dict[int, Dict]] = []
    query_sets: List[Dict[int, Dict]] = []
    coords = [(100.0 * p, 50.0 * p) for p in range(num_places)]
    for r in range(num_runs):
        db: Dict[int, Dict] = {}
        qs: Dict[int, Dict] = {}
        for p in range(num_places):
            db_name = f"run{r}/db_place{p:03d}.bin"
            q_name = f"run{r}/q_place{p:03d}.bin"
            clouds[db_name] = _make_submap(bases[p], rng, num_points)
            clouds[q_name] = _make_submap(bases[p], rng, num_points)
            db[p] = {
                "query": db_name,
                "northing": coords[p][0],
                "easting": coords[p][1],
            }
            qs[p] = {
                "query": q_name,
                "northing": coords[p][0],
                "easting": coords[p][1],
            }
        database_sets.append(db)
        query_sets.append(qs)
    # True positives: same place index in every *other* run's database
    # (reference layout: query_sets[n][i][m] = [matching db idxs in run m]).
    for n in range(num_runs):
        for i in query_sets[n]:
            for m in range(num_runs):
                query_sets[n][i][m] = [i]

    return SyntheticDataset(
        queries=queries,
        clouds=clouds,
        place_of=place_of,
        database_sets=database_sets,
        query_sets=query_sets,
    )
