"""Serving index: build/query/add/save/load round-trips on the synthetic
dataset; a trained model must retrieve the right place."""

import numpy as np
import jax
import pytest

from lpdnet_tpu.configs import ModelConfig
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.models.model import init_model
from lpdnet_tpu.serve import DescriptorIndex
from lpdnet_tpu.train.step import make_embed_fn

N = 64


@pytest.fixture(scope="module")
def bits():
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, use_input_transform=False,
    )
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    ds = make_synthetic_dataset(num_places=6, submaps_per_place=4, num_points=N)
    return make_embed_fn(model), variables, ds


def test_build_and_query_shapes(bits):
    embed, variables, ds = bits
    index = DescriptorIndex(embed, variables, batch_size=8)
    db = np.stack([ds.clouds[ds.database_sets[0][p]["query"]] for p in range(6)])
    assert index.build(db) == 6
    q = np.stack([ds.clouds[ds.query_sets[0][p]["query"]] for p in range(6)])
    idx, sqd = index.query(q, k=3)
    assert idx.shape == (6, 3) and sqd.shape == (6, 3)
    assert np.all(np.diff(sqd, axis=1) >= -1e-6)  # sorted ascending


def test_query_empty_raises(bits):
    embed, variables, _ = bits
    index = DescriptorIndex(embed, variables)
    with pytest.raises(RuntimeError, match="empty"):
        index.query(np.zeros((1, N, 3), np.float32))


def test_add_and_persistence(bits, tmp_path):
    embed, variables, ds = bits
    index = DescriptorIndex(embed, variables, batch_size=4)
    db = np.stack([ds.clouds[ds.database_sets[0][p]["query"]] for p in range(6)])
    index.build(db[:3])
    assert index.add(db[3:]) == 6
    path = str(tmp_path / "index.npz")
    index.save(path)

    index2 = DescriptorIndex(embed, variables, batch_size=4)
    assert index2.load(path) == 6
    q = db[:2]
    i1, d1 = index.query(q, k=2)
    i2, d2 = index2.query(q, k=2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_identical_submap_is_top1(bits):
    embed, variables, ds = bits
    index = DescriptorIndex(embed, variables, batch_size=8)
    db = np.stack([ds.clouds[ds.database_sets[0][p]["query"]] for p in range(6)])
    index.build(db)
    # Querying with the database clouds themselves: top-1 must be self.
    idx, sqd = index.query(db, k=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(6))
    np.testing.assert_allclose(sqd[:, 0], 0.0, atol=1e-5)


@pytest.mark.slow
def test_serve_cli_build_and_query(tmp_path):
    """The serving CLI end-to-end as a subprocess: save a config, build an
    index from a directory of .bin submaps, query with two of them — each
    query's top-1 must be its own database file, and the names round-trip
    through the .npz index."""
    import json
    import os
    import subprocess
    import sys

    from lpdnet_tpu.configs import Config, DataConfig, TrainConfig
    from lpdnet_tpu.data.binio import save_pc_file
    from lpdnet_tpu.utils.checkpoint import save_config

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    cfg = Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=N, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=False,
        ),
        data=DataConfig(num_points=N),
        train=TrainConfig(log_dir=str(log_dir)),
    )
    save_config(cfg, str(log_dir))

    rs = np.random.RandomState(0)
    db_dir, q_dir = tmp_path / "db", tmp_path / "q"
    clouds = rs.randn(6, N, 3).astype(np.float32) * 0.3
    for i, c in enumerate(clouds):
        save_pc_file(c, str(db_dir / f"{i:03d}.bin"))
    for i in (1, 4):
        save_pc_file(clouds[i], str(q_dir / f"q{i}.bin"))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, "-m", "lpdnet_tpu.serve",
            "--log_dir", str(log_dir),
            "--index", str(tmp_path / "index.npz"),
            "--build_dir", str(db_dir),
            "--query_dir", str(q_dir),
            "-k", "3", "--batch_size", "4",
        ],
        env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # No checkpoint was saved: the CLI must say so, not serve silently.
    assert "RANDOM INIT" in out.stderr
    results = [json.loads(line) for line in out.stdout.splitlines() if line]
    assert len(results) == 2
    for res, i in zip(results, (1, 4)):
        assert res["query"].endswith(f"q{i}.bin")
        top = res["neighbors"][0]
        assert top["file"].endswith(f"{i:03d}.bin")
        assert top["sq_dist"] == pytest.approx(0.0, abs=1e-5)

    # Query-only invocation: the database comes from the .npz on disk
    # (build+query above served it device-resident without reloading).
    out2 = subprocess.run(
        [
            sys.executable, "-m", "lpdnet_tpu.serve",
            "--log_dir", str(log_dir),
            "--index", str(tmp_path / "index.npz"),
            "--query_dir", str(q_dir),
            "-k", "3", "--batch_size", "4",
        ],
        env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    results2 = [json.loads(l) for l in out2.stdout.splitlines() if l]
    assert [r["neighbors"][0]["file"] for r in results2] == [
        r["neighbors"][0]["file"] for r in results
    ]


def test_query_descriptor_chunking_matches_unchunked(bits):
    """Chunked retrieval (the HBM guard for large query sets) must return
    exactly the unchunked results."""
    embed, variables, ds = bits
    index = DescriptorIndex(embed, variables, batch_size=8)
    db = np.stack(
        [ds.clouds[ds.database_sets[0][p]["query"]] for p in range(6)]
    )
    index.build(db)
    q = index.embed(db)
    i1, d1 = index.query_descriptors(q, k=3)
    i2, d2 = index.query_descriptors(q, k=3, chunk=2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-7)
