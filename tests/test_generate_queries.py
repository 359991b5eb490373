"""Query generation: pickle layouts, radius semantics, region exclusion
(SURVEY C7-C9) over a fabricated two-run mini-dataset."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from lpdnet_tpu.data.generate_queries import (
    check_in_test_set,
    construct_query_and_database_sets,
    construct_query_dict,
    generate_training_tuples,
)

REGION = [(1000.0, 1000.0)]


def make_mini_oxford(tmp_path, num_runs=2, n_side=8, spacing=20.0):
    """Two runs on the same 8x8 20 m grid (so cross-run positives exist),
    one corner inside the test region."""
    base = str(tmp_path / "benchmark_datasets")
    for r in range(num_runs):
        run_dir = os.path.join(base, "oxford", f"run{r}")
        os.makedirs(os.path.join(run_dir, "pointcloud_20m_10overlap"))
        rows = []
        ts = 0
        for i in range(n_side):
            for j in range(n_side):
                rows.append({
                    "timestamp": ts,
                    "northing": 900.0 + i * spacing,
                    "easting": 900.0 + j * spacing,
                })
                ts += 1
        pd.DataFrame(rows).to_csv(
            os.path.join(run_dir, "pointcloud_locations_20m_10overlap.csv"),
            index=False,
        )
    return base


def test_check_in_test_set():
    # width is the half-extent (reference x_width semantics: +-width, strict).
    assert check_in_test_set(1000.0, 1000.0, REGION)
    assert check_in_test_set(1149.9, 850.1, REGION)  # default width 150
    assert not check_in_test_set(1150.0, 1000.0, REGION)  # strict bound
    assert not check_in_test_set(1000.0, 1151.0, REGION)
    assert check_in_test_set(1074.9, 925.1, REGION, width=75.0)
    assert not check_in_test_set(1076.0, 1000.0, REGION, width=75.0)


def test_construct_query_dict_radii():
    # 1-D line of points, 10 m apart.
    df = pd.DataFrame({
        "northing": np.arange(6) * 10.0,
        "easting": np.zeros(6),
        "file": [f"f{i}.bin" for i in range(6)],
    })
    q = construct_query_dict(df, positive_radius=10.0, negative_radius=25.0)
    # Point 2 (at 20m): positives within 10m = points 1, 3; negatives
    # outside 25m = points 5 (at 50m) and 0? |20-0|=20 <= 25 -> excluded.
    assert sorted(q[2]["positives"]) == [1, 3]
    assert q[2]["negatives"] == [5]
    assert q[2]["query"] == "f2.bin"


def test_generate_training_tuples_baseline(tmp_path):
    base = make_mini_oxford(tmp_path)
    out = generate_training_tuples(
        base, str(tmp_path / "out"), "baseline",
        regions={"oxford": REGION}, region_width=75.0,
    )
    with open(out["train"], "rb") as f:
        train = pickle.load(f)
    with open(out["test"], "rb") as f:
        test = pickle.load(f)
    # Grid is 8x8 = 64 per run, 2 runs = 128 total. Region (half-extent
    # 75 m) covers the open square (925, 1075)^2 -> grid coords 900+i*20 in
    # {940..1060} -> i in 2..7 -> 6x6=36 per run in test.
    assert len(test) == 36 * 2
    assert len(train) == 128 - 72
    # Every entry has the reference layout.
    e = train[0]
    assert set(e.keys()) == {"query", "positives", "negatives"}
    assert e["query"].startswith("oxford/run")
    # Positives within 10 m on a 20 m grid can only be the SAME location
    # in the other run (distance 0).
    for i, entry in train.items():
        for p in entry["positives"]:
            assert train[p]["query"] != entry["query"]  # different run
    # Negatives all farther than 50 m.


def test_construct_query_and_database_sets(tmp_path):
    base = make_mini_oxford(tmp_path)
    db_path, q_path = construct_query_and_database_sets(
        base, "oxford", str(tmp_path / "out"), regions=REGION,
        region_width=75.0,
    )
    with open(db_path, "rb") as f:
        dbs = pickle.load(f)
    with open(q_path, "rb") as f:
        qss = pickle.load(f)
    assert len(dbs) == 2 and len(qss) == 2
    assert len(dbs[0]) == 64  # full run
    assert len(qss[0]) == 36  # region only
    # True positives of query (run 0) in database run 1: within 25 m ->
    # same grid node (distance 0) plus the 4-neighbours at 20 m.
    q0 = qss[0][0]
    assert 1 in q0  # tps vs run 1 present, none vs own run
    assert 0 not in q0
    tp = q0[1]
    assert len(tp) >= 1
    coords0 = np.array([q0["northing"], q0["easting"]])
    for t in tp:
        c = np.array([dbs[1][t]["northing"], dbs[1][t]["easting"]])
        assert np.linalg.norm(coords0 - c) <= 25.0
    # And it round-trips through the eval pipeline's expected layout:
    # query_sets[n][i][m] -> list of ints.
    assert all(isinstance(t, int) for t in tp)


def test_generated_pickles_feed_sampler(tmp_path):
    """The generated training pickle drives TupleSampler end to end."""
    from lpdnet_tpu.data.tuples import TupleSampler

    base = make_mini_oxford(tmp_path)
    out = generate_training_tuples(
        base, str(tmp_path / "out"), "baseline",
        regions={"oxford": REGION}, region_width=75.0,
    )
    with open(out["train"], "rb") as f:
        train = pickle.load(f)

    rs = np.random.RandomState(0)
    clouds = {e["query"]: rs.randn(32, 3).astype(np.float32)
              for e in train.values()}
    sampler = TupleSampler(train, lambda f: clouds[f], num_pos=1, num_neg=2)
    eligible = [i for i in sampler.all_indices
                if sampler.has_enough_positives(i)]
    assert eligible
    t = sampler.make_tuple(eligible[0], rs)
    assert t.query.shape == (32, 3)
