"""int16 fixed-point / float16 wire formats (utils/wire.py): encode/decode
round-trip accuracy, the out-of-range fallback, and descriptor neutrality
through a real embed function."""

import numpy as np
import pytest

import lpdnet_tpu.utils.wire as wire
from lpdnet_tpu.utils.wire import INT16_SCALE, decode_points, encode_points


def test_int16_roundtrip_precision(rng):
    pts = (rng.rand(4, 128, 3).astype(np.float32) - 0.5) * 2  # [-1, 1)
    enc = encode_points(pts, "int16")
    assert enc.dtype == np.int16
    dec = np.asarray(decode_points(enc))
    assert dec.dtype == np.float32
    # Max rounding error is half the quantization step.
    assert np.max(np.abs(dec - pts)) <= 0.5 / INT16_SCALE + 1e-7


def test_int16_out_of_range_falls_back_to_f16(rng):
    wire._warned_range = False
    pts = rng.randn(2, 64, 3).astype(np.float32) * 40.0  # raw-meter scale
    with pytest.warns(UserWarning, match="fixed-point wire"):
        enc = encode_points(pts, "int16")
    assert enc.dtype == np.float16
    # Warning fires once; the fallback keeps applying.
    enc2 = encode_points(pts, "int16")
    assert enc2.dtype == np.float16
    dec = np.asarray(decode_points(enc))
    np.testing.assert_allclose(dec, pts, rtol=1e-3)


def test_float_paths_passthrough(rng):
    pts = rng.randn(2, 64, 3).astype(np.float32)
    assert encode_points(pts, "float32") is pts
    assert encode_points(pts, "float16").dtype == np.float16
    assert np.asarray(decode_points(pts)).dtype == np.float32


@pytest.mark.slow
def test_embed_descriptor_neutrality_int16(rng):
    """Descriptors from the int16 wire must match the f32 path to high
    cosine — the decode precedes all compute (VERDICT round-2 item 4:
    audit >= 0.9999)."""
    import jax

    from lpdnet_tpu.configs import ModelConfig
    from lpdnet_tpu.models.model import init_model
    from lpdnet_tpu.train.step import make_embed_fn

    cfg = ModelConfig(
        trunk="lpdnet", num_points=256, feature_dim=64, num_clusters=8,
        graph_k=8, knn_window=None,
    )
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    embed = make_embed_fn(model)
    pts = rng.randn(2, 256, 3).astype(np.float32) * 0.3
    d32 = np.asarray(embed(variables, pts))
    d16 = np.asarray(embed(variables, encode_points(pts, "int16")))
    cos = np.sum(d32 * d16, axis=-1) / (
        np.linalg.norm(d32, axis=-1) * np.linalg.norm(d16, axis=-1)
    )
    assert np.min(cos) >= 0.9999


def test_int8_roundtrip_and_neutrality(rng):
    from lpdnet_tpu.utils.wire import INT8_SCALE

    pts = (rng.rand(4, 128, 3).astype(np.float32) - 0.5) * 2
    enc = encode_points(pts, "int8")
    assert enc.dtype == np.int8
    dec = np.asarray(decode_points(enc))
    assert np.max(np.abs(dec - pts)) <= 0.5 / INT8_SCALE + 1e-7


def test_int8_near_limit_falls_back(rng):
    """Coordinates in (127.49/64, 2) would round past int8's range and
    decode with up to 2x the documented error — they must take the
    fallback, not encode with silently-degraded precision."""
    from lpdnet_tpu.utils.wire import INT8_SCALE

    wire._warned_range = False
    pts = np.full((1, 8, 3), 1.995, np.float32)  # > 127.49/64 ~ 1.99203
    with pytest.warns(UserWarning, match="fixed-point wire"):
        enc = encode_points(pts, "int8")
    assert enc.dtype == np.float16
    # Anything on the safe side still encodes with the documented bound.
    safe = np.full((1, 8, 3), 1.99, np.float32)
    enc = encode_points(safe, "int8")
    assert enc.dtype == np.int8
    dec = np.asarray(decode_points(enc))
    assert np.max(np.abs(dec - safe)) <= 0.5 / INT8_SCALE + 1e-7


def test_strict_mode_keeps_dtype_and_clips(rng):
    """Multi-process sweeps bake the wire dtype into the shared SPMD
    program: strict encoding must never change dtype with the data."""
    wire._warned_clip = False
    pts = rng.randn(2, 64, 3).astype(np.float32) * 40.0
    with pytest.warns(UserWarning, match="clipping"):
        enc = encode_points(pts, "int8", strict=True)
    assert enc.dtype == np.int8
    dec = np.asarray(decode_points(enc))
    assert np.max(np.abs(dec)) <= 2.0  # clipped into range


def test_encode_batch_single_dtype_decision(rng):
    """One out-of-range tuple component must pull the WHOLE batch to
    float16: _flatten_tuples concatenates the components, so mixed dtypes
    would promote to f32 and skip the fixed-point descale entirely."""
    from lpdnet_tpu.utils.wire import encode_batch

    wire._warned_range = False
    good = (rng.rand(2, 3, 64, 3).astype(np.float32) - 0.5) * 2
    bad = np.full((2, 64, 3), 3.0, np.float32)  # out of range
    batch = {
        "query": good[:, 0], "positives": good[:, :2],
        "negatives": good[:, 1:], "other_neg": bad,
    }
    with pytest.warns(UserWarning, match="fixed-point wire"):
        enc = encode_batch(batch, "int16")
    assert {v.dtype for v in enc.values()} == {np.dtype(np.float16)}
    # All-in-range batches stay fixed-point.
    batch["other_neg"] = good[:, 2]
    enc = encode_batch(batch, "int16")
    assert {v.dtype for v in enc.values()} == {np.dtype(np.int16)}
    dec = np.asarray(decode_points(enc["query"]))
    np.testing.assert_allclose(dec, batch["query"], atol=0.5 / INT16_SCALE + 1e-7)
