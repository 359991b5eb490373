"""Serving: a device-resident descriptor index for online place recognition.

The reference stops at offline evaluation (SURVEY C18); a production
deployment needs the same two primitives online: embed incoming submaps and
retrieve nearest database descriptors. ``DescriptorIndex`` keeps the
database matrix on device, embeds queries through the jitted forward
(padded to a fixed batch so one compilation serves all traffic), and runs
retrieval as an MXU matmul + top-k — no host KDTree.

Example:
  model, variables = init_model(cfg.model, jax.random.key(0))
  index = DescriptorIndex(make_embed_fn(model), variables)
  index.build(database_clouds)           # (M, N, 3) or iterable of batches
  idx, sqd = index.query(query_clouds, k=5)
  index.save("index.npz"); index2 = DescriptorIndex.restore(...)
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from lpdnet_tpu.eval.recall import knn_retrieve
from lpdnet_tpu.utils.pipeline import pad_batch, pipelined_embed
from lpdnet_tpu.utils.wire import encode_points


class DescriptorIndex:
    """Embeds submaps and serves top-k retrieval over the database."""

    def __init__(
        self,
        embed_fn: Callable,
        variables,
        batch_size: int = 32,
        transfer_dtype: str = "int8",
    ):
        self.embed_fn = embed_fn
        self.variables = variables
        self.batch_size = batch_size
        # Wire format for submap uploads (utils/wire.py): int8 fixed-point
        # quarters transfer; measured retrieval-neutral (full-scale
        # descriptor cosine >= 0.99999 — PERF_LOG round 3).
        self.transfer_dtype = transfer_dtype
        self._db: Optional[jnp.ndarray] = None  # (M, D) on device

    # -- embedding ---------------------------------------------------------
    def embed(self, clouds: np.ndarray) -> np.ndarray:
        """(B, N, C) -> (B, D) descriptors; pads the tail to the fixed
        serving batch so the compiled program is reused, with a depth-1
        dispatch pipeline (next batch uploads while the device runs).
        An empty input returns an empty (0, 0) array."""
        bs = self.batch_size

        def batches():
            for start in range(0, len(clouds), bs):
                chunk = clouds[start : start + bs]
                yield encode_points(
                    pad_batch(chunk, bs), self.transfer_dtype
                ), len(chunk)

        return pipelined_embed(self.embed_fn, self.variables, batches())

    # -- database ----------------------------------------------------------
    def build(
        self, clouds: Union[np.ndarray, Iterable[np.ndarray]]
    ) -> int:
        """Embed the database submaps and keep descriptors on device."""
        if isinstance(clouds, np.ndarray):
            vecs = self.embed(clouds)
        else:
            vecs = np.concatenate([self.embed(c) for c in clouds], axis=0)
        self._db = jnp.asarray(vecs)
        return int(self._db.shape[0])

    def add(self, clouds: np.ndarray) -> int:
        """Append submaps to the database (incremental mapping)."""
        vecs = jnp.asarray(self.embed(clouds))
        self._db = vecs if self._db is None else jnp.concatenate(
            [self._db, vecs], axis=0
        )
        return int(self._db.shape[0])

    @property
    def size(self) -> int:
        return 0 if self._db is None else int(self._db.shape[0])

    # -- retrieval ---------------------------------------------------------
    def query(
        self, clouds: np.ndarray, k: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, N, C) query submaps -> (B, k) database indices + squared
        distances, nearest first."""
        if self._db is None:
            raise RuntimeError("index is empty; call build() first")
        q = self.embed(clouds)
        idx, sqd = knn_retrieve(self._db, jnp.asarray(q), min(k, self.size))
        return np.asarray(idx), np.asarray(sqd)

    def query_descriptors(
        self, descriptors: np.ndarray, k: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve for already-embedded descriptors."""
        if self._db is None:
            raise RuntimeError("index is empty; call build() first")
        idx, sqd = knn_retrieve(
            self._db, jnp.asarray(descriptors), min(k, self.size)
        )
        return np.asarray(idx), np.asarray(sqd)

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        if self._db is None:
            raise RuntimeError("index is empty")
        np.savez_compressed(path, database=np.asarray(self._db))

    def load(self, path: str) -> int:
        data = np.load(path)
        self._db = jnp.asarray(data["database"])
        return self.size
