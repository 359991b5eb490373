"""Recall@N computation for one (database run, query run) pair.

Reference: ``get_recall`` in ``evaluate.py`` (SURVEY C18, call stack §3.2):
sklearn KDTree over database descriptors, 25-NN per query, recall@1..25
curve from the first-hit rank, top-1% recall with threshold
``max(round(len(db)/100), 1)``, and mean top-1 dot-product similarity over
correct top-1 retrievals.

TPU-native change: the neighbour search is a device matmul + ``lax.top_k``
(descriptors are 256-D; brute force on the MXU beats tree traversal by
orders of magnitude), while hit-checking against the per-query true-positive
lists stays host-side (ragged lists).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def knn_retrieve(
    database: jnp.ndarray, queries: jnp.ndarray, k: int = 25
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest database rows per query (squared L2), on device.

    Two-stage for precision at matmul speed: the `|q|^2 - 2 q.d + |d|^2`
    decomposition runs on the MXU but suffers catastrophic cancellation for
    near-identical unit descriptors (fp32 noise ~1e-6 drowns gaps below
    ~1e-5, e.g. at random init or near-duplicate submaps), so the matmul
    only selects 4k candidates and the exact difference form
    `sum((q - d)^2)` re-ranks them.

    Returns (indices (Nq, k), sq_distances (Nq, k)) sorted ascending.
    """
    db = database.astype(jnp.float32)
    q = queries.astype(jnp.float32)
    nd = db.shape[0]
    # Center by the database mean: distances are translation-invariant, and
    # the cancellation magnitude in the decomposition drops from O(|x|^2)
    # to O(spread^2) — essential when descriptors cluster tightly (TPU f32
    # matmuls run as bf16 passes; uncentered unit vectors lose everything
    # below ~1e-6).
    mu = jnp.mean(db, axis=0, keepdims=True)
    db_c = db - mu
    q_c = q - mu
    d = (
        jnp.sum(q_c * q_c, axis=1, keepdims=True)
        - 2.0 * q_c @ db_c.T
        + jnp.sum(db_c * db_c, axis=1)[None, :]
    )
    k_cand = min(max(4 * k, 32), nd)
    _, cand = jax.lax.top_k(-d, k_cand)  # (Nq, k_cand)
    cand_vecs = db[cand]  # (Nq, k_cand, D)
    exact = jnp.sum((cand_vecs - q[:, None, :]) ** 2, axis=-1)
    neg_d, pos = jax.lax.top_k(-exact, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    return idx, jnp.maximum(-neg_d, 0.0)


def get_recall(
    database_vectors: np.ndarray,
    query_vectors: np.ndarray,
    true_positives: Sequence[Sequence[int]],
    num_neighbors: int = 25,
    precomputed_idx=None,
) -> Dict[str, object]:
    """Recall stats for one ordered (database run, query run) pair.

    Args:
      database_vectors: (Nd, D) descriptors of the database run.
      query_vectors: (Nq, D) descriptors of the query run.
      true_positives: per-query list of matching database indices (queries
        with an empty list are skipped, as in the reference).
      precomputed_idx: (Nq, k) neighbour indices from an earlier
        ``knn_retrieve`` dispatch — callers scoring several run pairs
        dispatch them all first so the device round-trips overlap
        (eval/evaluate.py).

    Returns:
      dict with 'recall' (cumulative %, length num_neighbors),
      'one_percent_recall' (%), 'top1_similarity' (list of dot products on
      correct top-1 hits), 'num_evaluated'.
    """
    nd = database_vectors.shape[0]
    k = min(num_neighbors, nd)
    if precomputed_idx is None:
        precomputed_idx, _ = knn_retrieve(
            jnp.asarray(database_vectors), jnp.asarray(query_vectors), k
        )
    idx = np.asarray(precomputed_idx)

    threshold = max(int(round(nd / 100.0)), 1)
    recall = np.zeros(num_neighbors)
    one_percent_hits = 0
    top1_similarity: List[float] = []
    num_evaluated = 0
    for i, tp in enumerate(true_positives):
        if len(tp) == 0:
            continue
        num_evaluated += 1
        tp_set = set(tp)
        hits = [j for j in range(k) if int(idx[i, j]) in tp_set]
        if hits:
            first = hits[0]
            recall[first] += 1
            if first == 0:
                sim = float(
                    np.dot(query_vectors[i], database_vectors[idx[i, 0]])
                )
                top1_similarity.append(sim)
            if first < threshold:
                one_percent_hits += 1
    if num_evaluated == 0:
        return {
            "recall": np.zeros(num_neighbors),
            "one_percent_recall": 0.0,
            "top1_similarity": [],
            "num_evaluated": 0,
        }
    return {
        "recall": np.cumsum(recall) / num_evaluated * 100.0,
        "one_percent_recall": one_percent_hits / num_evaluated * 100.0,
        "top1_similarity": top1_similarity,
        "num_evaluated": num_evaluated,
    }
