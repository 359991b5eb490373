"""Native C++ batch loader vs the NumPy reader, including error paths."""

import os

import numpy as np
import pytest

from lpdnet_tpu.data.binio import save_pc_file
from lpdnet_tpu.data.native_loader import NativeBatchLoader, build_native

N = 64


@pytest.fixture(scope="module")
def native_available():
    return build_native()


def _write_corpus(tmp_path, rng, count=6):
    paths, clouds = [], []
    for i in range(count):
        p = str(tmp_path / f"c{i}.bin")
        pts = rng.randn(N, 3).astype(np.float32)
        save_pc_file(pts, p)
        paths.append(p)
        clouds.append(pts)
    return paths, np.stack(clouds)


def test_native_matches_numpy(tmp_path, rng, native_available):
    assert native_available, "native build failed (g++ required)"
    paths, want = _write_corpus(tmp_path, rng)
    loader = NativeBatchLoader(num_points=N, dims=3)
    assert loader.is_native
    got = loader.load(paths)
    np.testing.assert_allclose(got, want, atol=1e-6)
    loader.close()


def test_native_13d(tmp_path, rng, native_available):
    p = str(tmp_path / "a13.bin")
    pts = rng.randn(N, 13).astype(np.float32)
    save_pc_file(pts, p)
    loader = NativeBatchLoader(num_points=N, dims=13)
    got = loader.load([p])
    np.testing.assert_allclose(got[0], pts, atol=1e-6)
    loader.close()


def test_native_missing_file_raises(tmp_path, rng, native_available):
    paths, _ = _write_corpus(tmp_path, rng, count=2)
    loader = NativeBatchLoader(num_points=N, dims=3)
    with pytest.raises(IOError, match="could not open"):
        loader.load(paths + [str(tmp_path / "nope.bin")])
    loader.close()


def test_native_bad_size_raises(tmp_path, rng, native_available):
    p = str(tmp_path / "short.bin")
    np.zeros(10, np.float64).tofile(p)
    loader = NativeBatchLoader(num_points=N, dims=3)
    with pytest.raises(IOError, match="unexpected file size"):
        loader.load([p])
    loader.close()


def test_fallback_without_native(tmp_path, rng, monkeypatch):
    import lpdnet_tpu.data.native_loader as nl

    monkeypatch.setattr(nl, "_SO_PATH", "/nonexistent/lib.so")
    paths, want = _write_corpus(tmp_path, rng, count=3)
    loader = nl.NativeBatchLoader(
        num_points=N, dims=3, build_if_missing=False
    )
    assert not loader.is_native
    got = loader.load(paths)
    np.testing.assert_allclose(got, want, atol=1e-6)
