"""Training-tuple assembly and batching.

Reference: ``get_query_tuple`` in ``loading_pointclouds.py`` (SURVEY C6):
one training example = query + ``num_pos`` sampled positives + ``num_neg``
negatives (hard negatives first when provided, random fill otherwise) +
``other_neg`` — a submap negative to the query, its positives, *and* every
selected negative (the quadruplet's fourth element).

The sampler is host-side NumPy; it produces batch-first stacked arrays for
the jitted train step. Point clouds are loaded through an injected ``loader``
callable so the real ``.bin`` reader and in-memory synthetic datasets share
one code path, with an optional in-process cache (the Oxford training set is
~1 GB as float32 — it fits).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from lpdnet_tpu.data.augment import jitter_point_cloud, rotate_point_cloud


@dataclass
class TrainingTuple:
    """One assembled training example (un-batched)."""

    query: np.ndarray  # (N, C)
    positives: np.ndarray  # (P, N, C)
    negatives: np.ndarray  # (M, N, C)
    other_neg: np.ndarray  # (N, C)


class TupleSampler:
    """Assembles reference-semantics training tuples and batches.

    Args:
      queries: training-query dict ``{idx: {'query', 'positives',
        'negatives'}}`` (reference pickle layout, SURVEY C2).
      loader: ``loader(filename) -> (N, C) float32`` point-cloud reader.
      num_pos / num_neg: tuple sizes (TRAIN_POSITIVES_PER_QUERY /
        TRAIN_NEGATIVES_PER_QUERY).
      cache: keep loaded clouds in memory keyed by filename.
    """

    def __init__(
        self,
        queries: Dict[int, Dict],
        loader: Callable[[str], np.ndarray],
        num_pos: int = 2,
        num_neg: int = 18,
        cache: bool = True,
    ):
        self.queries = queries
        self.loader = loader
        self.num_pos = num_pos
        self.num_neg = num_neg
        self._cache: Optional[Dict[str, np.ndarray]] = {} if cache else None
        self.all_indices = sorted(queries.keys())

    # -- loading ----------------------------------------------------------
    def load(self, idx: int) -> np.ndarray:
        fname = self.queries[idx]["query"]
        if self._cache is not None:
            pc = self._cache.get(fname)
            if pc is None:
                pc = self.loader(fname)
                self._cache[fname] = pc
            return pc
        return self.loader(fname)

    def has_enough_positives(self, idx: int) -> bool:
        return len(self.queries[idx]["positives"]) >= self.num_pos

    def is_trainable(self, idx: int) -> bool:
        """Queries a tuple can be built from: enough positives (reference
        skip rule) AND at least one negative (a zero-negative query — seen
        in small held-out regions where everything is within the negative
        radius — has no tuple; the reference would crash sampling it)."""
        return (
            self.has_enough_positives(idx)
            and len(self.queries[idx]["negatives"]) > 0
        )

    # -- tuple assembly (reference get_query_tuple semantics) --------------
    def make_tuple(
        self,
        idx: int,
        rng: np.random.RandomState,
        hard_negs: Sequence[int] = (),
    ) -> TrainingTuple:
        entry = self.queries[idx]
        pos_ids = list(
            rng.choice(entry["positives"], self.num_pos, replace=False)
        )

        negs: List[int] = [h for h in hard_negs[: self.num_neg]]
        # Negative pools may be python lists (reference pickles) or int
        # arrays (Oxford-scale worlds: 21.7k x thousands of indices cost
        # ~5 GB as lists of ints, ~350 MB as int32 arrays).
        neg_pool = entry["negatives"]
        if len(neg_pool) == 0 and not negs:
            raise ValueError(f"query {idx} has no negatives")
        if len(negs) < self.num_neg:
            # Random fill, avoiding duplicates with the hard picks. Dense
            # regions can have fewer than num_neg negatives: fall back to
            # sampling with replacement (the fixed tuple shape requires
            # num_neg entries; duplicates only weaken that tuple slightly).
            taken = set(negs)
            fill = [n for n in neg_pool if n not in taken] or list(neg_pool)
            needed = self.num_neg - len(negs)
            extra = rng.choice(fill, needed, replace=needed > len(fill))
            negs.extend(int(e) for e in extra)

        # other_neg: negative to the query tuple AND to every selected
        # negative — sample outside the union of their positive sets.
        neighbors = set(entry["positives"]) | {idx}
        for n in negs:
            neighbors.update(self.queries[n]["positives"])
            neighbors.add(n)
        possible = [i for i in self.all_indices if i not in neighbors]
        other = int(rng.choice(possible)) if possible else int(negs[-1])

        return TrainingTuple(
            query=self.load(idx),
            positives=np.stack([self.load(int(p)) for p in pos_ids]),
            negatives=np.stack([self.load(int(n)) for n in negs]),
            other_neg=self.load(other),
        )

    # -- batching ----------------------------------------------------------
    def collate(
        self,
        tuples: Sequence[TrainingTuple],
        rng: Optional[np.random.RandomState] = None,
        rotate: bool = False,
        jitter: bool = False,
        rotation_max_deg: float = 180.0,
        jitter_sigma: float = 0.005,
        jitter_clip: float = 0.05,
        transfer_dtype: str = "float32",
    ) -> Dict[str, np.ndarray]:
        """Stack tuples into a batch dict, optionally augmenting.

        The reference augments whole tuples (``get_rotated_tuple`` /
        ``get_jittered_tuple`` — SURVEY C5); augmentation here acts on the
        flat stack of all submaps in the batch, one independent draw per
        submap.

        ``transfer_dtype`` 'float16' or 'int16' emits the batch in a
        half-size wire format (the device step decodes back to f32 before
        compute — utils/wire.py): halves the per-step host->device upload,
        like the eval sweeps. f16 quantization on normalized coordinates
        is ~6e-4, int16 fixed-point ~3e-5 — both below the default jitter
        sigma=5e-3.
        """
        batch = {
            "query": np.stack([t.query for t in tuples]),
            "positives": np.stack([t.positives for t in tuples]),
            "negatives": np.stack([t.negatives for t in tuples]),
            "other_neg": np.stack([t.other_neg for t in tuples]),
        }
        if rotate or jitter:
            assert rng is not None
            b, n, c = batch["query"].shape
            p = batch["positives"].shape[1]
            m = batch["negatives"].shape[1]
            flat = np.concatenate(
                [
                    batch["query"][:, None],
                    batch["positives"],
                    batch["negatives"],
                    batch["other_neg"][:, None],
                ],
                axis=1,
            ).reshape(b * (1 + p + m + 1), n, c)
            if rotate:
                flat = rotate_point_cloud(flat, rng, rotation_max_deg)
            if jitter:
                flat = jitter_point_cloud(flat, rng, jitter_sigma, jitter_clip)
            flat = flat.reshape(b, 1 + p + m + 1, n, c)
            batch = {
                "query": flat[:, 0],
                "positives": flat[:, 1 : 1 + p],
                "negatives": flat[:, 1 + p : 1 + p + m],
                "other_neg": flat[:, -1],
            }
        from lpdnet_tpu.utils.wire import encode_batch

        # One dtype decision across all four components: _flatten_tuples
        # concatenates them, so a per-component float16 fallback would
        # produce a mixed-dtype batch that decodes with the wrong scale.
        return encode_batch(batch, transfer_dtype)

    def epoch_batches(
        self,
        batch_size: int,
        rng: np.random.RandomState,
        hard_negs_fn: Optional[
            Callable[[int, np.random.RandomState], Sequence[int]]
        ] = None,
        start_batch: int = 0,
        batch_rng_fn: Optional[Callable[[int], np.random.RandomState]] = None,
        **collate_kwargs,
    ) -> Iterator[Tuple[List[int], Dict[str, np.ndarray]]]:
        """Shuffled epoch iterator (reference ``train_one_epoch`` order:
        shuffle indices, skip queries with too few positives, drop the
        ragged tail batch).

        ``batch_rng_fn(batch_index) -> RandomState`` makes every batch's
        randomness (positive/negative sampling, augmentation draws)
        self-contained: with it, ``start_batch`` skips the first batches of
        the epoch WITHOUT perturbing the random stream of the rest — the
        basis for exact mid-epoch resume. Without it, all batches draw from
        the shared epoch ``rng`` (skipping would shift the stream).
        """
        order = [i for i in self.all_indices if self.is_trainable(i)]
        rng.shuffle(order)
        starts = range(0, len(order) - batch_size + 1, batch_size)
        for bi, start in enumerate(starts):
            if bi < start_batch:
                continue
            brng = batch_rng_fn(bi) if batch_rng_fn else rng
            ids = order[start : start + batch_size]
            tuples = [
                self.make_tuple(
                    i, brng, hard_negs_fn(i, brng) if hard_negs_fn else ()
                )
                for i in ids
            ]
            yield ids, self.collate(tuples, rng=brng, **collate_kwargs)
