"""Lazy triplet / quadruplet losses over descriptor tuples.

Reference: ``best_pos_distance``, ``triplet_loss``, ``triplet_loss_wrapper``,
``quadruplet_loss`` in ``loss/pointnetvlad_loss.py`` (SURVEY C14):

  * distances are **squared** Euclidean between descriptors;
  * ``best_pos_distance`` -> (min, max) query<->positive distance;
  * ``use_min=True`` uses the easiest positive, else the hardest;
  * ``lazy=True`` takes the max over negatives (lazy variant from the
    PointNetVLAD paper), else the sum;
  * ``ignore_zero_loss=True`` averages only over tuples with active hinge;
  * quadruplet adds a second hinge ``m2 + d(q,pos) - d(other_neg, neg_j)``
    pushing negatives away from a sample that is negative to everything.

Everything is pure jnp over batched tensors — computed in-batch on device,
inside the jitted train step (SURVEY §7 "Design stance").
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from lpdnet_tpu.configs import LossConfig


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance along the last axis."""
    d = a - b
    return jnp.sum(d * d, axis=-1)


def best_pos_distance(
    query: jnp.ndarray, pos_vecs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min and max squared distance from each query to its positives.

    Args:
      query: (B, D) query descriptors.
      pos_vecs: (B, P, D) positive descriptors.

    Returns:
      (min_pos, max_pos): each (B,).
    """
    d = _sqdist(query[:, None, :], pos_vecs)  # (B, P)
    return jnp.min(d, axis=1), jnp.max(d, axis=1)


def _hinge_mean(
    hinge: jnp.ndarray, lazy: bool, ignore_zero_loss: bool
) -> jnp.ndarray:
    """Reduce a (B, M) hinge matrix to a scalar with the reference's flags."""
    per_tuple = jnp.max(hinge, axis=1) if lazy else jnp.sum(hinge, axis=1)
    if ignore_zero_loss:
        active = (per_tuple > 1e-16).astype(jnp.float32)
        return jnp.sum(per_tuple * active) / jnp.maximum(jnp.sum(active), 1.0)
    return jnp.mean(per_tuple)


def _triplet_from_pos_d(
    query, neg_vecs, pos_d, margin, lazy, ignore_zero_loss
) -> jnp.ndarray:
    neg_d = _sqdist(query[:, None, :], neg_vecs)  # (B, M)
    hinge = jnp.maximum(margin + pos_d[:, None] - neg_d, 0.0)
    return _hinge_mean(hinge, lazy, ignore_zero_loss)


def triplet_loss(
    query: jnp.ndarray,
    pos_vecs: jnp.ndarray,
    neg_vecs: jnp.ndarray,
    margin: float,
    use_min: bool = False,
    lazy: bool = False,
    ignore_zero_loss: bool = False,
) -> jnp.ndarray:
    """Triplet hinge over all (query, positive*, negative_j) of a batch.

    Args:
      query: (B, D); pos_vecs: (B, P, D); neg_vecs: (B, M, D).
    """
    min_pos, max_pos = best_pos_distance(query, pos_vecs)
    pos_d = min_pos if use_min else max_pos
    return _triplet_from_pos_d(
        query, neg_vecs, pos_d, margin, lazy, ignore_zero_loss
    )


def quadruplet_loss(
    query: jnp.ndarray,
    pos_vecs: jnp.ndarray,
    neg_vecs: jnp.ndarray,
    other_neg: jnp.ndarray,
    margin_1: float,
    margin_2: float,
    use_min: bool = False,
    lazy: bool = False,
    ignore_zero_loss: bool = False,
) -> jnp.ndarray:
    """Lazy quadruplet loss (triplet term + other-neg term).

    Args:
      query: (B, D); pos_vecs: (B, P, D); neg_vecs: (B, M, D);
      other_neg: (B, D) — a sample negative to every tuple member.
    """
    min_pos, max_pos = best_pos_distance(query, pos_vecs)
    pos_d = min_pos if use_min else max_pos
    trip = _triplet_from_pos_d(
        query, neg_vecs, pos_d, margin_1, lazy, ignore_zero_loss
    )
    other_d = _sqdist(other_neg[:, None, :], neg_vecs)  # (B, M)
    hinge2 = jnp.maximum(margin_2 + pos_d[:, None] - other_d, 0.0)
    return trip + _hinge_mean(hinge2, lazy, ignore_zero_loss)


def triplet_loss_wrapper(
    query: jnp.ndarray,
    pos_vecs: jnp.ndarray,
    neg_vecs: jnp.ndarray,
    other_neg: jnp.ndarray,
    margin_1: float,
    margin_2: float,
    use_min: bool = False,
    lazy: bool = False,
    ignore_zero_loss: bool = False,
) -> jnp.ndarray:
    """Quadruplet-signature triplet loss (reference ``triplet_loss_wrapper``
    — SURVEY C14): lets the driver switch loss kinds behind one call
    signature; ``other_neg`` and ``margin_2`` are ignored."""
    del other_neg, margin_2
    return triplet_loss(
        query, pos_vecs, neg_vecs, margin_1,
        use_min=use_min, lazy=lazy, ignore_zero_loss=ignore_zero_loss,
    )


def loss_from_config(
    cfg: LossConfig,
    query: jnp.ndarray,
    pos_vecs: jnp.ndarray,
    neg_vecs: jnp.ndarray,
    other_neg: jnp.ndarray,
) -> jnp.ndarray:
    """Dispatch on LossConfig (the training driver's single entry point)."""
    if cfg.kind == "quadruplet":
        return quadruplet_loss(
            query, pos_vecs, neg_vecs, other_neg,
            cfg.margin_1, cfg.margin_2,
            use_min=cfg.use_min, lazy=cfg.lazy,
            ignore_zero_loss=cfg.ignore_zero_loss,
        )
    if cfg.kind == "triplet":
        return triplet_loss(
            query, pos_vecs, neg_vecs, cfg.margin_1,
            use_min=cfg.use_min, lazy=cfg.lazy,
            ignore_zero_loss=cfg.ignore_zero_loss,
        )
    raise ValueError(f"unknown loss kind: {cfg.kind!r}")
