"""Unit tests for the dispatch-pipelining utilities (utils/pipeline.py) —
shared by the eval sweep, the mining refresh, and the serving index."""

import logging
import time

import numpy as np
import pytest

from lpdnet_tpu.utils.pipeline import (
    chunk_batches,
    pad_batch,
    pipelined_embed,
    prefetch_iterator,
)


def test_prefetch_preserves_order_and_items():
    items = list(range(57))
    assert list(prefetch_iterator(iter(items), depth=3)) == items


def test_prefetch_relays_worker_exception():
    def gen():
        yield 1
        raise RuntimeError("boom in worker")

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom in worker"):
        next(it)


def test_prefetch_early_close_stops_worker():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.2)  # give a runaway worker time to misbehave
    n = len(produced)
    time.sleep(0.2)
    # The worker stopped: nothing more gets produced after close.
    assert len(produced) == n < 100


def test_prefetch_close_logs_inflight_worker_error(caplog):
    """A relayed exception sitting in the queue when the consumer closes
    (mining-refresh restarts) must be logged, not silently dropped
    (ADVICE round 2)."""

    def gen():
        yield 1
        raise RuntimeError("late failure")

    it = prefetch_iterator(gen(), depth=4)
    assert next(it) == 1
    time.sleep(0.2)  # let the worker enqueue the exception
    with caplog.at_level(logging.WARNING, logger="lpdnet_tpu.utils.pipeline"):
        it.close()
    assert any("late failure" in r.getMessage() for r in caplog.records)


def _np_embed(variables, pts):
    # Stands in for the jitted embed: (B, N) -> (B, 2). Plain numpy output
    # exercises the copy_to_host_async AttributeError guard.
    return np.stack([pts.sum(axis=1), pts.max(axis=1)], axis=1)


def test_pipelined_embed_concats_valid_rows():
    rs = np.random.RandomState(0)
    batches = []
    expect = []
    for count in (4, 4, 2):  # short tail: only `count` rows are valid
        pts = rs.randn(4, 8).astype(np.float32)
        batches.append((pts, count))
        expect.append(_np_embed(None, pts)[:count])
    out = pipelined_embed(_np_embed, None, iter(batches), depth=2)
    np.testing.assert_allclose(out, np.concatenate(expect), rtol=1e-6)


def test_pipelined_embed_empty_iterator():
    out = pipelined_embed(_np_embed, None, iter([]))
    assert out.shape == (0, 0)


def test_pipelined_embed_flattens_scan_chunked_superbatches():
    # (K, B, D) outputs flatten to rows with the first `count` valid.
    def embed_many(variables, stacked):
        return np.stack([_np_embed(None, p) for p in stacked])

    rs = np.random.RandomState(1)
    pts = [rs.randn(4, 8).astype(np.float32) for _ in range(4)]
    grouped = list(chunk_batches(((p, 4) for p in pts), chunk=2))
    assert len(grouped) == 2 and all(g[1] == 8 for g in grouped)
    out = pipelined_embed(embed_many, None, iter(grouped))
    expect = np.concatenate([_np_embed(None, p) for p in pts])
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_chunk_batches_tail_repeats_and_counts():
    pts = [np.full((2, 3), i, np.float32) for i in range(3)]
    grouped = list(chunk_batches(((p, 2) for p in pts), chunk=2))
    assert len(grouped) == 2
    assert grouped[0][0].shape == (2, 2, 3) and grouped[0][1] == 4
    # Tail chunk repeats its last batch; only 2 rows counted valid.
    assert grouped[1][1] == 2
    np.testing.assert_array_equal(grouped[1][0][0], grouped[1][0][1])


def test_pad_batch():
    pts = np.arange(6, dtype=np.float32).reshape(2, 3)
    padded = pad_batch(pts, 5)
    assert padded.shape == (5, 3)
    np.testing.assert_array_equal(padded[2], padded[1])
    assert pad_batch(padded, 5) is padded  # full batch: no copy
