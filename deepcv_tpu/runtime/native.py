"""ctypes bindings for the native host-IO runtime (libdeepcv_io.so).

See deepcv_io.cpp for what lives natively: threaded batch gather and a
background-producer ring-buffer loader (the C++ replacement for the
reference's DataLoader worker processes + prefetch monkey-patch,
/root/reference/src/deepcv/meta/data/datasets.py:76-115).

Everything degrades gracefully: if the library is absent and cannot be built
(no compiler), callers fall back to the numpy paths in data.pipeline.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["native_available", "build_native_lib", "gather_batch",
           "NativeBatchLoader"]

_logger = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libdeepcv_io.so"
_lib = None


def build_native_lib(force: bool = False) -> bool:
    """Build libdeepcv_io.so with make/g++; returns success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        out = subprocess.run(["make", "-C", str(_HERE)], capture_output=True,
                             text=True, timeout=120)
        if out.returncode != 0:
            _logger.warning("native build failed: %s", out.stderr[-500:])
            return False
        return _LIB_PATH.exists()
    except Exception as e:  # pragma: no cover
        _logger.warning("native build unavailable: %s", e)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native_lib():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.deepcv_gather_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int32]
    lib.deepcv_loader_create.restype = ctypes.c_void_p
    lib.deepcv_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
        ctypes.c_int32]
    lib.deepcv_loader_next.restype = ctypes.c_int64
    lib.deepcv_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
    lib.deepcv_loader_steps_per_epoch.restype = ctypes.c_int64
    lib.deepcv_loader_steps_per_epoch.argtypes = [ctypes.c_void_p]
    lib.deepcv_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.deepcv_io_version.restype = ctypes.c_int32
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def gather_batch(data: np.ndarray, indices: np.ndarray,
                 out: Optional[np.ndarray] = None,
                 n_threads: int = 0) -> np.ndarray:
    """Threaded gather: out[i] = data[indices[i]] (row-major samples)."""
    lib = _load()
    data = np.ascontiguousarray(data)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    sample_bytes = int(data.dtype.itemsize * np.prod(data.shape[1:]))
    if out is None:
        out = np.empty((len(idx), *data.shape[1:]), dtype=data.dtype)
    if lib is None:  # numpy fallback
        np.take(data, idx, axis=0, out=out)
        return out
    lib.deepcv_gather_batch(
        data.ctypes.data_as(ctypes.c_void_p), sample_bytes,
        idx.ctypes.data_as(ctypes.c_void_p), len(idx),
        out.ctypes.data_as(ctypes.c_void_p), int(n_threads))
    return out


class NativeBatchLoader:
    """Background-producer batch loader backed by the C++ ring buffer.

    Keeps ``depth`` shuffled batches pre-gathered by a native thread; iterate
    with :meth:`__next__` (returns ``(images, targets)`` numpy arrays) —
    drop-in alternative to data.pipeline.BatchIterator for the streaming path.
    """

    def __init__(self, images: np.ndarray, targets: np.ndarray, batch_size: int,
                 depth: int = 3, seed: int = 0, shuffle: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable; use BatchIterator")
        self._lib = lib
        # keep strong refs: the loader holds raw pointers into these
        self.images = np.ascontiguousarray(images)
        self.targets = np.ascontiguousarray(targets)
        self.batch_size = int(batch_size)
        self._img_bytes = int(self.images.dtype.itemsize
                              * np.prod(self.images.shape[1:]))
        self._tgt_bytes = int(self.targets.dtype.itemsize
                              * max(1, int(np.prod(self.targets.shape[1:]))))
        self._handle = lib.deepcv_loader_create(
            self.images.ctypes.data_as(ctypes.c_void_p),
            self.targets.ctypes.data_as(ctypes.c_void_p),
            len(self.images), self._img_bytes, self._tgt_bytes,
            self.batch_size, int(depth), int(seed), int(bool(shuffle)))
        if not self._handle:
            raise RuntimeError("deepcv_loader_create failed")
        self.steps_per_epoch = int(lib.deepcv_loader_steps_per_epoch(self._handle))

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        imgs = np.empty((self.batch_size, *self.images.shape[1:]),
                        dtype=self.images.dtype)
        tgts = np.empty((self.batch_size, *self.targets.shape[1:]),
                        dtype=self.targets.dtype)
        step = self._lib.deepcv_loader_next(
            self._handle, imgs.ctypes.data_as(ctypes.c_void_p),
            tgts.ctypes.data_as(ctypes.c_void_p))
        if step < 0:
            raise StopIteration
        return imgs, tgts

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.deepcv_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
