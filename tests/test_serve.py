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
