"""Morton sort + slab-dedup gather (the documented negative-result kernel):
correctness on CPU (interpret mode), locality property on synthetic data."""

import jax
import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.knn import knn_indices
from lpdnet_tpu.ops.morton import morton_codes, morton_sort
from lpdnet_tpu.ops.pallas.edge_gather_dedup import (
    dedup_slab_lists,
    edge_max_gather_dedup,
)


def test_morton_sort_preserves_points(rng):
    pts = rng.randn(3, 128, 3).astype(np.float32)
    out = np.asarray(morton_sort(jnp.asarray(pts)))
    assert out.shape == pts.shape
    for b in range(3):
        a = pts[b][np.lexsort(pts[b].T)]
        c = out[b][np.lexsort(out[b].T)]
        np.testing.assert_allclose(a, c, rtol=1e-6)


def test_morton_sort_orders_codes(rng):
    pts = rng.randn(2, 256, 3).astype(np.float32)
    out = morton_sort(jnp.asarray(pts))
    codes = np.asarray(morton_codes(out))
    assert (np.diff(codes, axis=-1) >= 0).all()


def test_morton_sort_improves_knn_locality(rng):
    # Clustered cloud: neighbours of a Morton-sorted point span far fewer
    # 16-row slabs than in arbitrary order (the property the slab-dedup and
    # windowed-kNN optimizations rely on).
    centers = rng.randn(8, 3)
    pts = (centers[:, None] + rng.randn(8, 64, 3) * 0.05).reshape(512, 3)
    pts = pts[rng.permutation(512)][None]  # arbitrary (shuffled) order
    pts = jnp.asarray(pts.astype(np.float32))

    def mean_slabs(p):
        idx = np.asarray(knn_indices(p, 10, exact=True))
        bases = idx // 16
        return np.mean([len(np.unique(r)) for r in bases[0]])

    assert mean_slabs(morton_sort(pts)) < 0.55 * mean_slabs(pts)


def test_dedup_lists_cover_all_neighbors(rng):
    idx = rng.randint(0, 64, (2, 32, 7)).astype(np.int32)
    bases, bits, nslab = jax.tree_util.tree_map(
        np.asarray, dedup_slab_lists(jnp.asarray(idx), slab=16)
    )
    for b in range(2):
        for m in range(32):
            got = set()
            for s in range(int(nslab[b, m, 0])):
                for r in range(16):
                    if (bits[b, m, s] >> r) & 1:
                        got.add(int(bases[b, m, s]) + r)
            assert got == set(idx[b, m].tolist())


def test_edge_max_gather_dedup_matches_oracle(rng):
    b, n, k, c = 2, 64, 5, 16
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    got = np.asarray(
        edge_max_gather_dedup(f, idx, tile_m=32, interpret=True)
    )
    want = np.asarray(jnp.max(gather_neighbors(f, idx), axis=2))
    np.testing.assert_allclose(got, want, atol=1e-6)
