"""Wire codec for the streaming host->device feed (r4 verdict #6).

On tunneled backends the streaming train path (``device_resident_dataset:
false``) is bound by host->device bandwidth (measured 7-53 MB/s across
sessions), and it ships raw uint8 image batches (reference analogue: the
DataLoader prefetch pipeline it replaces, datasets.py:76-115). Nothing
user-controllable runs on the far side of the tunnel except XLA programs —
so a useful wire codec must put FEWER bytes on the wire and decode ON
DEVICE, with static shapes. zlib/range-coding can't do that; this module
implements the classic fixed-width trick that can:

  delta (along the image row, mod 256) -> zigzag -> pack to ``bits`` bits
  per subpixel -> exceptions (values that don't fit) as a padded
  (index, value) side list, scattered back on device with OOB-dropping.

Everything on the device side is VPU-friendly elementwise work plus one
``cumsum`` per batch; the exception list is padded to a power-of-two bucket
so the jitted decoder compiles O(log n) variants, not one per batch.
Losslessness is unconditional: a batch whose encoded size would not beat
raw (e.g. uniform-random bytes) returns ``None`` from :func:`encode_u8`
and the caller ships it raw — the codec never makes the wire worse.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

__all__ = ["encode_u8", "decode_u8", "device_decode", "wire_bytes"]

_SUPPORTED_BITS = (2, 4)
_MIN_EXC_BUCKET = 64


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def encode_u8(x: np.ndarray, bits: int = 4,
              axis: int = -2) -> Optional[Dict[str, np.ndarray]]:
    """Encode a uint8 array for the wire; ``None`` if raw is smaller.

    ``axis`` is the delta/integration axis — the image row (W) for NHWC
    batches, so smooth horizontal structure turns into near-zero deltas.
    The payload dict contains only ndarrays (jit-friendly) plus the static
    ``shape``/``bits`` entries the decoder needs.
    """
    if bits not in _SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {_SUPPORTED_BITS}, got {bits}")
    x = np.asarray(x)
    if x.dtype != np.uint8:
        raise ValueError(f"wire codec is for uint8 feeds, got {x.dtype}")
    axis = axis % x.ndim
    # mod-256 delta along the row axis (u8 arithmetic wraps by definition);
    # the first element keeps its raw value = delta against 0
    d = x.copy()
    sl_hi = [slice(None)] * x.ndim
    sl_lo = [slice(None)] * x.ndim
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    d[tuple(sl_hi)] = x[tuple(sl_hi)] - x[tuple(sl_lo)]
    # zigzag: small |signed delta| -> small unsigned code
    s = d.view(np.int8).astype(np.int16)
    z = (((s << 1) ^ (s >> 7)) & 0xFF).astype(np.uint8).reshape(-1)
    n = z.size
    lim = np.uint8(1 << bits)
    exc_mask = z >= lim
    exc_idx = np.flatnonzero(exc_mask).astype(np.uint32)
    exc_val = z[exc_mask]
    group = 8 // bits
    bucket = max(_MIN_EXC_BUCKET, _next_pow2(len(exc_idx)))
    wire = -(-n // group) + 5 * bucket
    if wire >= n:          # incompressible batch: ship raw, stay lossless
        return None
    # pad the base stream to a whole number of groups, pack LSB-first
    zp = np.zeros(-(-n // group) * group, np.uint8)
    zp[:n] = z & np.uint8(lim - 1)
    zp = zp.reshape(-1, group)
    packed = np.zeros(zp.shape[0], np.uint8)
    for g in range(group):
        packed |= zp[:, g] << np.uint8(g * bits)
    # pad exceptions to the bucket with OUT-OF-RANGE indices: the device
    # scatter runs mode='drop', so padding rows are no-ops by construction
    pad = bucket - len(exc_idx)
    if pad:
        exc_idx = np.concatenate([exc_idx, np.full(pad, n, np.uint32)])
        exc_val = np.concatenate([exc_val, np.zeros(pad, np.uint8)])
    return {"packed": packed, "exc_idx": exc_idx, "exc_val": exc_val,
            "shape": tuple(x.shape), "bits": bits, "axis": axis}


def wire_bytes(payload: Optional[Dict[str, np.ndarray]]) -> int:
    """Bytes this payload puts on the host->device wire."""
    if payload is None:
        return 0
    return (payload["packed"].nbytes + payload["exc_idx"].nbytes
            + payload["exc_val"].nbytes)


def decode_u8(packed, exc_idx, exc_val, shape, bits: int, axis: int):
    """Jittable device-side decoder (pure function of arrays + statics)."""
    import jax.numpy as jnp

    group = 8 // bits
    n = int(np.prod(shape))
    shifts = (jnp.arange(group, dtype=jnp.uint8) * np.uint8(bits))
    z = (packed[:, None] >> shifts[None, :]) & np.uint8((1 << bits) - 1)
    z = z.reshape(-1)[:n]
    z = z.at[exc_idx].set(exc_val, mode="drop")
    zi = z.astype(jnp.int16)
    s = (zi >> 1) ^ -(zi & 1)                     # un-zigzag
    d = s.astype(jnp.uint8).reshape(shape)        # mod-256 deltas
    # integrate along the row axis; mod distributes over the running sum
    x = jnp.cumsum(d.astype(jnp.uint32), axis=axis) & 0xFF
    return x.astype(jnp.uint8)


@functools.lru_cache(maxsize=32)
def _decode_jit(shape, bits, axis, sharding):
    import jax
    fn = functools.partial(decode_u8, shape=shape, bits=bits, axis=axis)
    return jax.jit(fn, out_shardings=sharding) if sharding is not None \
        else jax.jit(fn)


def device_decode(payload: Dict[str, np.ndarray], sharding=None):
    """device_put the payload and run the jitted on-device decoder.

    Both steps are async — the decoded batch is a device array the training
    step consumes without any host sync, so the only wire traffic is the
    packed payload (the point of the codec)."""
    import jax
    fn = _decode_jit(payload["shape"], payload["bits"], payload["axis"],
                     sharding)
    return fn(jax.device_put(payload["packed"]),
              jax.device_put(payload["exc_idx"]),
              jax.device_put(payload["exc_val"]))


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
