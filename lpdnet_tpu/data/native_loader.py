"""ctypes binding for the native threaded batch loader (native/loader.cpp).

The reference's per-file Python reads sit inside the training hot loop and
the ~22k-file mining sweeps (SURVEY C3/§3.1); the native loader reads a
whole batch with a C++ thread pool and converts float64 -> float32 off the
GIL. Falls back transparently to the NumPy path when the shared library has
not been built (``make -C native``) — every caller keeps working, just
slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from lpdnet_tpu.data.binio import load_pc_file

_SO_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "liblpdloader.so",
)

_STATUS_MESSAGES = {
    -1: "could not open file",
    -2: "unexpected file size",
    -3: "short read",
}


def build_native(quiet: bool = True) -> bool:
    """Build the shared library in-tree; returns success."""
    native_dir = os.path.dirname(_SO_PATH)
    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True,
            capture_output=quiet,
        )
        return os.path.isfile(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


class NativeBatchLoader:
    """Threaded batch loader: list of paths -> (B, N, C) float32.

    Usage:
      loader = NativeBatchLoader(num_points=4096, dims=3)
      batch = loader.load([path0, path1, ...])   # parallel C++ reads
    """

    def __init__(
        self,
        num_points: int = 4096,
        dims: int = 3,
        n_threads: int = 0,
        build_if_missing: bool = True,
    ):
        self.num_points = num_points
        self.dims = dims
        self._lib = None
        self._handle = None
        if not os.path.isfile(_SO_PATH) and build_if_missing:
            build_native()
        if os.path.isfile(_SO_PATH):
            lib = ctypes.CDLL(_SO_PATH)
            lib.lpd_loader_create.restype = ctypes.c_void_p
            lib.lpd_loader_create.argtypes = [ctypes.c_int]
            lib.lpd_load_batch.restype = ctypes.c_int
            lib.lpd_load_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.lpd_loader_destroy.argtypes = [ctypes.c_void_p]
            self._lib = lib
            self._handle = lib.lpd_loader_create(n_threads)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def load(
        self, paths: Sequence[str], dataset_folder: str = ""
    ) -> np.ndarray:
        """Load a batch of raw-float64 ``.bin`` submaps -> float32 array."""
        full = [
            os.path.join(dataset_folder, p) if dataset_folder else p
            for p in paths
        ]
        if not self.is_native:
            return np.stack(
                [load_pc_file(p, num_points=self.num_points) for p in full]
            )
        count = len(full)
        out = np.empty(
            (count, self.num_points, self.dims), dtype=np.float32
        )
        statuses = np.zeros(count, dtype=np.int32)
        c_paths = (ctypes.c_char_p * count)(
            *[p.encode() for p in full]
        )
        ok = self._lib.lpd_load_batch(
            self._handle,
            c_paths,
            count,
            self.num_points,
            self.dims,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if ok != count:
            bad = int(np.flatnonzero(statuses != 0)[0])
            msg = _STATUS_MESSAGES.get(int(statuses[bad]), "unknown error")
            raise IOError(f"{full[bad]}: {msg} (status {statuses[bad]})")
        return out

    def close(self) -> None:
        if self._handle is not None:
            self._lib.lpd_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
