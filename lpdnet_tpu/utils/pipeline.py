"""Depth-1 dispatch pipelining for descriptor sweeps.

This backend's dispatch is asynchronous and only a host transfer
synchronizes (~24 ms round-trip); draining batch i while batch i+1 is being
assembled/uploaded overlaps host IO, the RTT, and device compute. Shared by
the eval sweep, the mining cache refresh, and the serving index.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Tuple

import numpy as np


def pipelined_embed(
    embed_fn: Callable,
    variables,
    batches: Iterable[Tuple[np.ndarray, int]],
) -> np.ndarray:
    """Run ``embed_fn(variables, pts)`` over (padded_batch, true_count)
    pairs with one dispatch in flight; returns the concatenated (sum of
    counts, D) descriptors (empty (0, 0) for an empty iterator)."""
    outs: List[np.ndarray] = []
    pending = None
    for pts, count in batches:
        fut = embed_fn(variables, pts)
        if pending is not None:
            prev, prev_count = pending
            outs.append(np.asarray(prev)[:prev_count])
        pending = (fut, count)
    if pending is not None:
        prev, prev_count = pending
        outs.append(np.asarray(prev)[:prev_count])
    if not outs:
        return np.zeros((0, 0), np.float32)
    return np.concatenate(outs, axis=0)


def pad_batch(pts: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad a possibly-short batch to ``batch_size`` rows (repeats the last
    row) so the jitted embed function keeps a single compiled shape."""
    pad = batch_size - len(pts)
    if pad:
        pts = np.concatenate([pts, np.repeat(pts[-1:], pad, 0)])
    return pts
