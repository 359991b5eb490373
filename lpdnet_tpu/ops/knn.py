"""Blockwise k-nearest-neighbour search.

Replaces the reference's materialize-the-full-N^2-matrix + ``torch.topk``
pattern (reference: ``models`` ``knn()`` — SURVEY C11) with a *tiled* search:
queries are processed in blocks so only a (block, Nd) distance tile is ever
live, scanned with ``lax.scan``. This is this domain's analogue of blockwise
attention (SURVEY §5 "long-context" row): point count can scale without an
N^2 buffer.

Used three times per LPD forward (SURVEY §7 "Hard parts"): the feature-stage
neighborhood, the Cartesian-space graph, and the learned-feature-space graph.

Selection runs through ``lax.approx_min_k`` (the TPU PartialReduce path;
exact full-sort fallback on CPU) with a tunable ``recall_target``; the
``exact=True`` mode switches to ``lax.top_k`` and is what oracles and
offline data prep use.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpdnet_tpu.ops.pairwise import pairwise_sqdist


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.jit,
    static_argnames=(
        "k", "block", "exclude_self", "exact", "recall_target", "dist_dtype",
        "window",
    ),
)
def knn_indices_and_dists(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    *,
    block: int = 1024,
    exclude_self: bool = False,
    exact: bool = False,
    recall_target: float = 0.95,
    dist_dtype: str = "float32",
    window: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest database points for every query point, blockwise.

    Args:
      queries: (B, Nq, C) query points.
      database: (B, Nd, C) database points.
      k: neighbours to return (k <= Nd).
      block: query-tile size; one (B, block, Nd) distance tile is live at a
        time. Rounded to cover Nq exactly (queries are zero-padded).
      exclude_self: if True, assumes queries is database (Nq == Nd) and masks
        the diagonal so a point is not its own neighbour.
      exact: use ``lax.top_k`` (exact, slow on TPU) instead of
        ``lax.approx_min_k`` (the TPU PartialReduce selection path, ~5x
        faster at ~0.99 per-neighbour recall for k=20 over 4096; exact on
        CPU where it falls back to full sort).
      recall_target: per-neighbour recall for the approximate path.
      window: Morton-window half-width. Requires queries IS database in
        Morton-sorted order (``ops.morton.morton_sort``): query block
        [q0, q0+block) only scans database rows [q0-window, q0+block+window)
        — sorted points put ~96-98%% of true neighbours inside a 256-512
        window (measured), and the distance tile shrinks from (block, Nd)
        to (block, block+2*window). The dominant cost of the scan is that
        tile's HBM traffic, so this is a ~Nd/(block+2w) speedup at a
        bounded neighbour-recall cost.

    Returns:
      (idx, dist): (B, Nq, k) int32 neighbour indices and (B, Nq, k) float32
      squared distances, both sorted ascending by distance.
    """
    b, nq, c = queries.shape
    nd = database.shape[1]
    if k > nd - (1 if exclude_self else 0):
        raise ValueError(f"k={k} too large for Nd={nd} (exclude_self={exclude_self})")
    if window is not None and nq != nd:
        raise ValueError(
            "window requires a self-graph (queries is database, Nq == Nd)"
        )

    block = min(block, _round_up(nq, 8))
    nq_pad = _round_up(nq, block)
    num_blocks = nq_pad // block

    q_pad = jnp.pad(queries.astype(jnp.float32), ((0, 0), (0, nq_pad - nq), (0, 0)))
    q_tiles = q_pad.reshape(b, num_blocks, block, c).transpose(1, 0, 2, 3)
    if exclude_self:
        base = jax.lax.broadcasted_iota(jnp.int32, (num_blocks, block), 0) * block
        row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (num_blocks, block), 1)
    else:
        row_ids = jnp.zeros((num_blocks, block), jnp.int32)

    db = database.astype(jnp.float32)
    win_n = nd if window is None else min(block + 2 * window, nd)
    if window is not None and win_n >= nd:
        window = None  # degenerate: the window covers everything
        win_n = nd
    if window is not None and k > win_n - (1 if exclude_self else 0):
        raise ValueError(
            f"k={k} too large for the candidate window "
            f"(block + 2*window = {win_n}); widen window or block"
        )
    if window is not None:
        los = np.clip(
            np.arange(num_blocks) * block - window, 0, nd - win_n
        ).astype(np.int32)
    else:
        los = np.zeros(num_blocks, np.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, win_n), 2)

    def scan_body(carry, tile):
        q_tile, rows, lo = tile  # (B, block, C), (block,), ()
        cand = (
            db if window is None
            else jax.lax.dynamic_slice_in_dim(db, lo, win_n, axis=1)
        )
        d = pairwise_sqdist(q_tile, cand)  # (B, block, win_n)
        if exclude_self:
            d = jnp.where(col_ids + lo == rows[None, :, None], jnp.inf, d)
        if exact:
            neg_d, idx = jax.lax.top_k(-d, k)
            dist = -neg_d
        else:
            # Optionally select over a bf16 distance tile: the scan is
            # HBM-bound on the (B, block, Nd) buffer feeding the custom
            # selection call; ~0.4% relative distance fuzz.
            dist, idx = jax.lax.approx_min_k(
                d.astype(jnp.dtype(dist_dtype)), k,
                recall_target=recall_target,
            )
        return carry, ((idx + lo).astype(jnp.int32), dist.astype(jnp.float32))

    _, (idx, dist) = jax.lax.scan(
        scan_body, None, (q_tiles, row_ids, jnp.asarray(los))
    )
    # (num_blocks, B, block, k) -> (B, Nq, k)
    idx = idx.transpose(1, 0, 2, 3).reshape(b, nq_pad, k)[:, :nq]
    dist = dist.transpose(1, 0, 2, 3).reshape(b, nq_pad, k)[:, :nq]
    return idx, dist


def knn_indices(
    points: jnp.ndarray,
    k: int,
    *,
    features: Optional[jnp.ndarray] = None,
    block: int = 1024,
    exclude_self: bool = False,
    exact: bool = False,
    recall_target: float = 0.95,
    dist_dtype: str = "float32",
    window: Optional[int] = None,
) -> jnp.ndarray:
    """kNN graph over one point set (the common model-side call).

    Args:
      points: (B, N, C) points defining the metric space. If ``features`` is
        given, the graph is built over ``features`` instead (the LPD feature-
        space graph) — ``points`` is ignored for distances.
      k: neighbours per point.
      exclude_self: mask the self-match (reference's graph keeps self-match
        at distance 0; the edge feature x_j - x_i is then 0, harmless either
        way — we default to keeping it, matching torch.topk on a matrix whose
        diagonal is 0).

    Returns:
      (B, N, k) int32 neighbour indices.
    """
    space = features if features is not None else points
    idx, _ = knn_indices_and_dists(
        space, space, k, block=block, exclude_self=exclude_self,
        exact=exact, recall_target=recall_target, dist_dtype=dist_dtype,
        window=window,
    )
    return idx
