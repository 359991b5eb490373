"""Offline dataset preparation: training tuples + evaluation sets.

Reference: ``generating_queries/generate_training_tuples_baseline.py``,
``generate_training_tuples_refine.py``, ``generate_test_sets.py``
(SURVEY C7-C9, call stack §3.4). Host-side pandas + sklearn KDTree over UTM
(northing, easting) coordinates; emits the exact pickle layouts the training
and evaluation pipelines consume (SURVEY C2):

  * ``training_queries_baseline.pickle`` — Oxford runs, positives within
    10 m, negatives outside 50 m, four rectangular test regions excluded;
  * ``training_queries_refine.pickle`` — adds university/residential/
    business runs, positives within 12.5 m;
  * ``<set>_evaluation_database.pickle`` / ``<set>_evaluation_query.pickle``
    — per-run database + query dicts, true positives within 25 m.

Region centers: the Oxford p1-p4 below are the published PointNetVLAD
benchmark test rectangles. The reference mount was empty during the survey
(SURVEY provenance note), so the U.S.-set centers could not be read —
pass ``--regions_json`` to supply or override any region list.

Expected on-disk layout (reference benchmark_datasets/):
  <base>/oxford/<run>/pointcloud_locations_20m_10overlap.csv
  <base>/oxford/<run>/pointcloud_20m_10overlap/<timestamp>.bin
  <base>/<university|residential|business>_run*/...  (refine/test sets)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.neighbors import KDTree

# Published Oxford test-region centers (northing, easting).
OXFORD_TEST_REGIONS: List[Tuple[float, float]] = [
    (5735712.768124, 620084.402381),
    (5735611.299219, 620540.270327),
    (5735237.358209, 620543.094379),
    (5734749.303802, 619932.693364),
]
# Half-extent of each square test region, in meters. The upstream
# PointNetVLAD-family scripts (inherited by LPD-Net-Pytorch) test
# ``point - x_width < northing < point + x_width`` with ``x_width = 150``,
# i.e. +-150 m around each center (300 m squares). The reference mount was
# empty both survey sessions, so this follows the upstream-family semantics
# (ADVICE round 1); re-verify against
# ``generating_queries/generate_training_tuples_baseline.py`` if the mount
# appears.
REGION_WIDTH = 150.0


def check_in_test_set(
    northing: float,
    easting: float,
    regions: Sequence[Tuple[float, float]],
    width: float = REGION_WIDTH,
) -> bool:
    """True if the point falls inside any test rectangle (reference
    ``check_in_test_set``: center +- width in both axes, strict bounds)."""
    for cn, ce in regions:
        if cn - width < northing < cn + width and (
            ce - width < easting < ce + width
        ):
            return True
    return False


def construct_query_dict(
    df: pd.DataFrame,
    positive_radius: float,
    negative_radius: float,
) -> Dict[int, Dict]:
    """Reference ``construct_query_dict``: KDTree over UTM; positives =
    within ``positive_radius`` (self excluded), negatives = everything
    outside ``negative_radius``."""
    coords = df[["northing", "easting"]].to_numpy()
    tree = KDTree(coords)
    pos_lists = tree.query_radius(coords, r=positive_radius)
    far_lists = tree.query_radius(coords, r=negative_radius)
    queries: Dict[int, Dict] = {}
    all_ids = np.arange(len(df))
    files = df["file"].tolist()
    for i in range(len(df)):
        positives = np.setdiff1d(pos_lists[i], [i]).tolist()
        negatives = np.setdiff1d(all_ids, far_lists[i]).tolist()
        queries[i] = {
            "query": files[i],
            "positives": positives,
            "negatives": negatives,
        }
    return queries


def _load_run_csv(
    base: str, dataset: str, run: str, csv_name: str, pc_dir: str
) -> Optional[pd.DataFrame]:
    csv_path = os.path.join(base, dataset, run, csv_name)
    if not os.path.isfile(csv_path):
        return None
    df = pd.read_csv(csv_path)
    df["file"] = [
        f"{dataset}/{run}/{pc_dir}/{ts}.bin" for ts in df["timestamp"]
    ]
    return df


def _runs(base: str, dataset: str) -> List[str]:
    root = os.path.join(base, dataset)
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )


DATASET_LAYOUTS = {
    # dataset -> (csv name, pointcloud dir, positive radius for refine)
    "oxford": ("pointcloud_locations_20m_10overlap.csv",
               "pointcloud_20m_10overlap", 10.0),
    "university": ("pointcloud_centroids_25.csv", "pointcloud_25m_25", 12.5),
    "residential": ("pointcloud_centroids_25.csv", "pointcloud_25m_25", 12.5),
    "business": ("pointcloud_centroids_25.csv", "pointcloud_25m_25", 12.5),
}


def generate_training_tuples(
    base: str,
    out_dir: str,
    mode: str = "baseline",
    regions: Optional[Dict[str, List[Tuple[float, float]]]] = None,
    region_width: float = REGION_WIDTH,
) -> Dict[str, str]:
    """Build training/test query pickles (SURVEY C7/C8).

    baseline: Oxford only, positives within 10 m, negatives outside 50 m.
    refine: adds the U.S. sets with 12.5 m positives; same negative rule.
    """
    regions = regions or {"oxford": OXFORD_TEST_REGIONS}
    datasets = ["oxford"] if mode == "baseline" else list(DATASET_LAYOUTS)

    train_frames, test_frames = [], []
    for ds in datasets:
        csv_name, pc_dir, pos_r = DATASET_LAYOUTS[ds]
        for run in _runs(base, ds):
            df = _load_run_csv(base, ds, run, csv_name, pc_dir)
            if df is None:
                continue
            ds_regions = regions.get(ds, [])
            in_test = df.apply(
                lambda r: check_in_test_set(
                    r["northing"], r["easting"], ds_regions, region_width
                ),
                axis=1,
            )
            # Refine-stage U.S. sets train on everything (the reference's
            # refine script does not re-split them).
            if mode == "refine" and ds != "oxford":
                train_frames.append(df)
            else:
                train_frames.append(df[~in_test])
                test_frames.append(df[in_test])

    train_df = pd.concat(train_frames, ignore_index=True)
    pos_r = 10.0 if mode == "baseline" else 12.5
    train_queries = construct_query_dict(train_df, pos_r, 50.0)

    os.makedirs(out_dir, exist_ok=True)
    train_name = f"training_queries_{mode}.pickle"
    with open(os.path.join(out_dir, train_name), "wb") as f:
        pickle.dump(train_queries, f, protocol=pickle.HIGHEST_PROTOCOL)
    outputs = {"train": os.path.join(out_dir, train_name)}

    if test_frames:
        test_df = pd.concat(test_frames, ignore_index=True)
        test_queries = construct_query_dict(test_df, pos_r, 50.0)
        test_name = f"test_queries_{mode}.pickle"
        with open(os.path.join(out_dir, test_name), "wb") as f:
            pickle.dump(test_queries, f, protocol=pickle.HIGHEST_PROTOCOL)
        outputs["test"] = os.path.join(out_dir, test_name)
    return outputs


def construct_query_and_database_sets(
    base: str,
    dataset: str,
    out_dir: str,
    regions: Optional[Sequence[Tuple[float, float]]] = None,
    true_positive_radius: float = 25.0,
    region_width: float = REGION_WIDTH,
) -> Tuple[str, str]:
    """Build ``<dataset>_evaluation_{database,query}.pickle`` (SURVEY C9).

    Per run: database = every submap of the run; queries = submaps inside
    the test regions (whole run when no regions are given, as for the U.S.
    sets). ``query_sets[n][i][m]`` lists database indices of run ``m``
    within ``true_positive_radius`` of query ``i`` of run ``n``.
    """
    csv_name, pc_dir, _ = DATASET_LAYOUTS[dataset]
    database_sets: List[Dict[int, Dict]] = []
    query_sets: List[Dict[int, Dict]] = []
    database_coords: List[np.ndarray] = []
    for run in _runs(base, dataset):
        df = _load_run_csv(base, dataset, run, csv_name, pc_dir)
        if df is None:
            continue
        db: Dict[int, Dict] = {}
        qs: Dict[int, Dict] = {}
        q_i = 0
        for _, row in df.iterrows():
            entry = {
                "query": row["file"],
                "northing": row["northing"],
                "easting": row["easting"],
            }
            db[len(db)] = dict(entry)
            if regions is None or check_in_test_set(
                row["northing"], row["easting"], regions, region_width
            ):
                qs[q_i] = dict(entry)
                q_i += 1
        database_sets.append(db)
        query_sets.append(qs)
        database_coords.append(
            np.array([[e["northing"], e["easting"]] for e in db.values()])
        )

    for m, db_coords in enumerate(database_coords):
        tree = KDTree(db_coords)
        for n, qs in enumerate(query_sets):
            if m == n:
                continue
            for i in sorted(qs.keys()):
                pt = np.array(
                    [[qs[i]["northing"], qs[i]["easting"]]]
                )
                idxs = tree.query_radius(pt, r=true_positive_radius)
                qs[i][m] = idxs[0].tolist()

    os.makedirs(out_dir, exist_ok=True)
    db_path = os.path.join(out_dir, f"{dataset}_evaluation_database.pickle")
    q_path = os.path.join(out_dir, f"{dataset}_evaluation_query.pickle")
    with open(db_path, "wb") as f:
        pickle.dump(database_sets, f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(q_path, "wb") as f:
        pickle.dump(query_sets, f, protocol=pickle.HIGHEST_PROTOCOL)
    return db_path, q_path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_folder", required=True)
    p.add_argument("--out_dir", default=".")
    p.add_argument(
        "--mode", default="baseline",
        choices=["baseline", "refine", "test_sets"],
    )
    p.add_argument(
        "--datasets", nargs="*", default=["oxford"],
        help="for test_sets mode: which datasets to build eval sets for",
    )
    p.add_argument(
        "--regions_json", default=None,
        help="JSON file: {dataset: [[northing, easting], ...]} region centers",
    )
    p.add_argument(
        "--region_width", type=float, default=REGION_WIDTH,
        help="test-region half-extent in meters (reference x_width)",
    )
    args = p.parse_args()

    regions = None
    if args.regions_json:
        with open(args.regions_json) as f:
            regions = {
                k: [tuple(c) for c in v] for k, v in json.load(f).items()
            }

    if args.mode in ("baseline", "refine"):
        outputs = generate_training_tuples(
            args.dataset_folder, args.out_dir, args.mode, regions,
            region_width=args.region_width,
        )
        for kind, path in outputs.items():
            print(f"{kind}: {path}")
    else:
        all_regions = regions or {"oxford": OXFORD_TEST_REGIONS}
        for ds in args.datasets:
            db, q = construct_query_and_database_sets(
                args.dataset_folder, ds, args.out_dir,
                regions=all_regions.get(ds),
                region_width=args.region_width,
            )
            print(f"{ds}: {db} {q}")


if __name__ == "__main__":
    main()
