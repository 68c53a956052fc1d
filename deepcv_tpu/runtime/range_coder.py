"""Range coder: native (libdeepcv_rc.so) with a bit-identical Python mirror.

The sequential half of the learned lossless codec (see deepcv_rc.cpp for
the design note; /root/reference/README.md:157 for the reference intent).
``rc_encode``/``rc_decode`` take per-symbol cumulative-frequency rows —
``cdf[i]`` is the uint32 CDF of symbol ``i`` with ``cdf[i][0] == 0`` and
``cdf[i][-1] == TOTAL (1<<16)`` — exactly what the codec's probability
model emits after :func:`deepcv_tpu.codec.quantize_cdf`.

Both implementations realize the SAME carry-less 32-bit range coder
(Subbotin's public-domain scheme), so their byte streams are
interchangeable; tests assert it.
"""
from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["TOTAL", "rc_encode", "rc_decode", "rc_native_available"]

_logger = logging.getLogger(__name__)

TOTAL = 1 << 16
_TOP = 1 << 24
_BOT = 1 << 16
_M32 = 0xFFFFFFFF

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libdeepcv_rc.so"
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists():
        from deepcv_tpu.runtime.native import build_native_lib
        if not build_native_lib() or not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        _logger.warning("libdeepcv_rc load failed: %s", e)
        return None
    lib.deepcv_rc_encode.restype = ctypes.c_int64
    lib.deepcv_rc_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64]
    lib.deepcv_rc_decode.restype = ctypes.c_int64
    lib.deepcv_rc_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_void_p]
    _lib = lib
    return lib


def rc_native_available() -> bool:
    return _load() is not None


def _check(syms: np.ndarray, cdf: np.ndarray):
    syms = np.ascontiguousarray(syms, dtype=np.uint16)
    cdf = np.ascontiguousarray(cdf, dtype=np.uint32)
    if cdf.ndim != 2 or cdf.shape[1] < 2:
        raise ValueError(f"cdf must be (n, K+1), got {cdf.shape}")
    return syms, cdf


# ---------------------------------------------------------------------------
# Pure-Python mirror (masked uint32 arithmetic — identical streams)
# ---------------------------------------------------------------------------

def _py_encode(syms: np.ndarray, cdf: np.ndarray) -> bytes:
    low, rng = 0, _M32
    out = bytearray()
    for i in range(len(syms)):
        row = cdf[i]
        s = int(syms[i])
        cum, freq = int(row[s]), int(row[s + 1] - row[s])
        rng >>= 16
        low = (low + cum * rng) & _M32
        rng = (rng * freq) & _M32
        while True:
            if (low ^ ((low + rng) & _M32)) < _TOP:
                pass
            elif rng < _BOT:
                rng = (0 - low) & (_BOT - 1)
            else:
                break
            out.append((low >> 24) & 0xFF)
            low = (low << 8) & _M32
            rng = (rng << 8) & _M32
    for _ in range(4):
        out.append((low >> 24) & 0xFF)
        low = (low << 8) & _M32
    return bytes(out)


def _py_decode(data: bytes, n: int, cdf: np.ndarray) -> np.ndarray:
    low, rng, code, pos = 0, _M32, 0, 0

    def get():
        nonlocal pos
        b = data[pos] if pos < len(data) else 0
        pos += 1
        return b

    for _ in range(4):
        code = ((code << 8) | get()) & _M32
    out = np.empty(n, dtype=np.uint16)
    for i in range(n):
        row = cdf[i]
        rng >>= 16
        v = min(((code - low) & _M32) // rng, _BOT - 1)
        s = int(np.searchsorted(row, v, side="right")) - 1
        out[i] = s
        cum, freq = int(row[s]), int(row[s + 1] - row[s])
        low = (low + cum * rng) & _M32
        rng = (rng * freq) & _M32
        while True:
            if (low ^ ((low + rng) & _M32)) < _TOP:
                pass
            elif rng < _BOT:
                rng = (0 - low) & (_BOT - 1)
            else:
                break
            code = ((code << 8) | get()) & _M32
            low = (low << 8) & _M32
            rng = (rng << 8) & _M32
    return out


# ---------------------------------------------------------------------------
# Public API (native when available)
# ---------------------------------------------------------------------------

def rc_encode(syms: np.ndarray, cdf: np.ndarray,
              force_python: bool = False) -> bytes:
    """Encode ``syms`` (n,) against per-symbol CDF rows (n, K+1)."""
    syms, cdf = _check(syms, cdf)
    lib = None if force_python else _load()
    if lib is None:
        return _py_encode(syms, cdf)
    cap = len(syms) * 3 + 64   # worst case ~2B/symbol at freq>=1; headroom
    out = np.empty(cap, dtype=np.uint8)
    ln = lib.deepcv_rc_encode(
        syms.ctypes.data_as(ctypes.c_void_p), len(syms),
        cdf.ctypes.data_as(ctypes.c_void_p), cdf.shape[1],
        out.ctypes.data_as(ctypes.c_void_p), cap)
    if ln < 0:  # pragma: no cover — cap is provably sufficient
        return _py_encode(syms, cdf)
    return out[:ln].tobytes()


def rc_decode(data: bytes, n: int, cdf: np.ndarray,
              force_python: bool = False) -> np.ndarray:
    """Decode ``n`` symbols from ``data`` against the SAME CDF rows."""
    _, cdf = _check(np.empty(0, np.uint16), cdf)
    if n == 0:
        return np.empty(0, dtype=np.uint16)
    lib = None if force_python else _load()
    if lib is None:
        return _py_decode(data, n, cdf)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint16)
    lib.deepcv_rc_decode(
        buf.ctypes.data_as(ctypes.c_void_p), len(buf), n,
        cdf.ctypes.data_as(ctypes.c_void_p), cdf.shape[1],
        out.ctypes.data_as(ctypes.c_void_p))
    return out
