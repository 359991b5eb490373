"""Data layer: bin round-trip, pickle round-trip, augmentation invariants,
tuple assembly semantics (SURVEY §4)."""

import os
import pickle

import numpy as np
import pytest

from lpdnet_tpu.data.augment import jitter_point_cloud, rotate_point_cloud
from lpdnet_tpu.data.binio import load_pc_file, load_pc_files, save_pc_file
from lpdnet_tpu.data.pickles import get_queries_dict, get_sets_dict, save_pickle
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler


def test_bin_roundtrip(tmp_path, rng):
    pts = rng.randn(64, 3).astype(np.float32)
    path = str(tmp_path / "a.bin")
    save_pc_file(pts, path)
    # Reference layout: raw float64 stream.
    raw = np.fromfile(path, dtype=np.float64)
    assert raw.size == 64 * 3
    back = load_pc_file(path, num_points=64)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_bin_13d_and_batch(tmp_path, rng):
    pts = rng.randn(32, 13).astype(np.float32)
    path = str(tmp_path / "b.bin")
    save_pc_file(pts, path)
    back = load_pc_file(path, num_points=32)
    assert back.shape == (32, 13)
    batch = load_pc_files([path, path], num_points=32)
    assert batch.shape == (2, 32, 13)


def test_bin_bad_size_raises(tmp_path):
    path = str(tmp_path / "c.bin")
    np.zeros(100, np.float64).tofile(path)
    with pytest.raises(ValueError):
        load_pc_file(path, num_points=64)


def test_pickle_roundtrip(tmp_path):
    queries = {0: {"query": "x.bin", "positives": [1], "negatives": [2]}}
    sets = [{0: {"query": "y.bin", "northing": 1.0, "easting": 2.0, 1: [0]}}]
    qp, sp = str(tmp_path / "q.pickle"), str(tmp_path / "s.pickle")
    save_pickle(queries, qp)
    save_pickle(sets, sp)
    assert get_queries_dict(qp) == queries
    assert get_sets_dict(sp) == sets


def test_rotation_preserves_z_and_norms(rng):
    pts = rng.randn(4, 50, 3).astype(np.float32)
    rot = rotate_point_cloud(pts, np.random.RandomState(0))
    np.testing.assert_allclose(rot[..., 2], pts[..., 2], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(rot[..., :2], axis=-1),
        np.linalg.norm(pts[..., :2], axis=-1),
        rtol=1e-4, atol=1e-5,
    )


def test_rotation_leaves_extra_columns(rng):
    pts = rng.randn(2, 30, 13).astype(np.float32)
    rot = rotate_point_cloud(pts, np.random.RandomState(0))
    np.testing.assert_allclose(rot[..., 3:], pts[..., 3:], atol=0)


def test_jitter_clipped(rng):
    pts = np.zeros((2, 40, 3), np.float32)
    jit = jitter_point_cloud(pts, np.random.RandomState(0), sigma=1.0, clip=0.05)
    assert np.abs(jit).max() <= 0.05 + 1e-6
    assert np.abs(jit).max() > 0.0


def test_tuple_sampler_semantics():
    ds = make_synthetic_dataset(num_places=5, submaps_per_place=4, num_points=32)
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    t = sampler.make_tuple(0, rng)
    assert t.query.shape == (32, 3)
    assert t.positives.shape == (2, 32, 3)
    assert t.negatives.shape == (4, 32, 3)
    assert t.other_neg.shape == (32, 3)


def test_tuple_hard_negatives_come_first():
    ds = make_synthetic_dataset(num_places=5, submaps_per_place=4, num_points=32)
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    hard = ds.queries[0]["negatives"][:2]
    t = sampler.make_tuple(0, rng, hard_negs=hard)
    for j, h in enumerate(hard):
        np.testing.assert_allclose(
            t.negatives[j], sampler.load(h), atol=0
        )


def test_epoch_batches_shapes_and_coverage():
    ds = make_synthetic_dataset(num_places=6, submaps_per_place=4, num_points=32)
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=3)
    rng = np.random.RandomState(0)
    seen = []
    for ids, batch in sampler.epoch_batches(4, rng, rotate=True, jitter=True):
        assert batch["query"].shape == (4, 32, 3)
        assert batch["positives"].shape == (4, 2, 32, 3)
        assert batch["negatives"].shape == (4, 3, 32, 3)
        assert batch["other_neg"].shape == (4, 32, 3)
        seen.extend(ids)
    assert len(seen) == len(set(seen))
    assert len(seen) == (24 // 4) * 4


def test_synthetic_world_families():
    """Hard/ground worlds (the round-5 discriminating audits): layout
    matches the easy world, generation is deterministic, family structure
    makes same-family places more alike than cross-family ones, and the
    ground world's sheet is a real coplanar mass at z ~ -0.8."""
    import pytest

    common = dict(num_places=8, submaps_per_place=4, num_points=64,
                  num_families=2, seed=3)
    hard = make_synthetic_dataset(world="hard", **common)
    hard2 = make_synthetic_dataset(world="hard", **common)
    assert sorted(hard.clouds) == sorted(hard2.clouds)
    for k in hard.clouds:
        np.testing.assert_array_equal(hard.clouds[k], hard2.clouds[k])
        assert hard.clouds[k].shape == (64, 3)
        assert hard.clouds[k].dtype == np.float32
    assert len(hard.queries) == 32
    assert len(hard.database_sets) == 2

    # Rotation-invariant coarse signature: sorted radial/z histogram.
    def sig(p):
        pts = np.concatenate(
            [hard.clouds[f"place{p:03d}/sub{s:03d}.bin"] for s in range(4)]
        )
        r = np.linalg.norm(pts[:, :2], axis=1)
        h1, _ = np.histogram(r, bins=8, range=(0, 1.5), density=True)
        h2, _ = np.histogram(pts[:, 2], bins=8, range=(-1, 1), density=True)
        return np.concatenate([h1, h2])

    # Places p and p+2 share a family (p % num_families); p and p+1 don't.
    same = np.linalg.norm(sig(0) - sig(2)) + np.linalg.norm(sig(1) - sig(3))
    cross = np.linalg.norm(sig(0) - sig(1)) + np.linalg.norm(sig(2) - sig(3))
    assert same < cross, (same, cross)

    ground = make_synthetic_dataset(world="ground", ground_frac=0.6, **common)
    g_pts = np.concatenate(list(ground.clouds.values()))
    sheet = np.abs(g_pts[:, 2] + 0.8) < 0.1
    frac = sheet.mean()
    assert 0.35 < frac < 0.75, frac  # occlusion/resampling moves it a bit

    # The easy world's stream is untouched by the new knobs.
    easy_a = make_synthetic_dataset(num_places=4, submaps_per_place=2,
                                    num_points=32, seed=1)
    easy_b = make_synthetic_dataset(num_places=4, submaps_per_place=2,
                                    num_points=32, seed=1,
                                    world="clustered", num_families=5,
                                    occlusion=99.0)
    for k in easy_a.clouds:
        np.testing.assert_array_equal(easy_a.clouds[k], easy_b.clouds[k])

    with pytest.raises(ValueError, match="world"):
        make_synthetic_dataset(world="lunar")


def test_other_neg_is_negative_to_all():
    ds = make_synthetic_dataset(num_places=6, submaps_per_place=4, num_points=32)
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=3)
    rng = np.random.RandomState(1)
    # Reconstruct which index the other_neg was by matching the cloud.
    t = sampler.make_tuple(0, rng)
    match = [
        i for i in sampler.all_indices
        if np.array_equal(sampler.load(i), t.other_neg)
    ]
    assert match
    other_place = ds.place_of[match[0]]
    assert other_place != ds.place_of[0]
