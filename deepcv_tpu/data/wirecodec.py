"""Wire codec for the streaming host->device feed (r4 verdict #6).

On tunneled backends the streaming train path (``device_resident_dataset:
false``) is bound by host->device bandwidth (measured 7-53 MB/s across
sessions), and it ships raw uint8 image batches (reference analogue: the
DataLoader prefetch pipeline it replaces, datasets.py:76-115). Nothing
user-controllable runs on the far side of the tunnel except XLA programs —
so a useful wire codec must put FEWER bytes on the wire and decode ON
DEVICE with static shapes. zlib/range coding can't do that; this module
implements the fixed-width escape-code scheme that can:

  delta (along a chosen axis, mod 256) -> zigzag -> ``bits``-bit base
  codes where the all-ones code is an ESCAPE -> escaped values go to a
  dense 1-byte overflow stream in position order (no indices on the wire).

Decoding is VPU-friendly: unpack base codes, find escapes, match the i-th
escape to the i-th overflow byte via ``cumsum`` ranks, un-zigzag, and one
``cumsum`` integrates the deltas. The overflow stream is padded to a
power-of-two bucket so the jitted decoder compiles O(log n) variants, not
one per batch. Losslessness is unconditional: a batch whose encoded size
would not beat raw (e.g. the uniform-noise synthetic CIFAR fallback, zlib
ratio 1.01) returns ``None`` and the caller ships it raw — the codec never
makes the wire worse.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

__all__ = ["encode_u8", "decode_u8", "device_decode", "wire_bytes"]

_SUPPORTED_BITS = (2, 3, 4)
_MIN_OVERFLOW_BUCKET = 64

# zigzag of the mod-256 delta byte, as a table: _ZIGZAG_LUT[d] =
# (s << 1) ^ (s >> 7) for s = d as int8 — 0,-1,1,-2,... -> 0,1,2,3,...
_s = np.arange(256, dtype=np.uint8).view(np.int8).astype(np.int16)
_ZIGZAG_LUT = (((_s << 1) ^ (_s >> 7)) & 0xFF).astype(np.uint8)
del _s


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _pack_bits(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack ``bits``-bit codes little-endian into bytes (host side)."""
    if bits in (2, 4):
        group = 8 // bits
        pad = (-len(codes)) % group
        c = np.concatenate([codes, np.zeros(pad, np.uint8)]).reshape(-1, group)
        out = np.zeros(c.shape[0], np.uint8)
        for g in range(group):
            out |= c[:, g] << np.uint8(g * bits)
        return out
    # bits=3: 8 codes -> 3 bytes (v0..v7 laid out little-endian in 24 bits)
    pad = (-len(codes)) % 8
    v = np.concatenate([codes, np.zeros(pad, np.uint8)]) \
        .reshape(-1, 8).astype(np.uint32)
    word = np.zeros(v.shape[0], np.uint32)
    for g in range(8):
        word |= v[:, g] << np.uint32(3 * g)
    out = np.empty((v.shape[0], 3), np.uint8)
    out[:, 0] = word & 0xFF
    out[:, 1] = (word >> 8) & 0xFF
    out[:, 2] = (word >> 16) & 0xFF
    return out.reshape(-1)


def encode_u8(x: np.ndarray, bits: int = 4,
              axis: int = -2) -> Optional[Dict[str, np.ndarray]]:
    """Encode a uint8 array for the wire; ``None`` if raw is smaller.

    ``axis`` is the delta/integration axis — the image row (W) for NHWC
    batches, so smooth horizontal structure turns into near-zero deltas.
    The payload dict contains only ndarrays (jit-friendly) plus the static
    ``shape``/``bits``/``axis`` entries the decoder needs.
    """
    if bits not in _SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {_SUPPORTED_BITS}, got {bits}")
    x = np.asarray(x)
    if x.dtype != np.uint8:
        raise ValueError(f"wire codec is for uint8 feeds, got {x.dtype}")
    axis = axis % x.ndim
    # mod-256 delta along the chosen axis (u8 arithmetic wraps by
    # definition); the first element keeps its raw value = delta against 0
    d = x.copy()
    sl_hi = [slice(None)] * x.ndim
    sl_lo = [slice(None)] * x.ndim
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    d[tuple(sl_hi)] = x[tuple(sl_hi)] - x[tuple(sl_lo)]
    # zigzag via a 256-entry LUT (the encoder runs on the 1-core feed host
    # next to the batch gather — int16 arithmetic passes measured ~3x the
    # LUT's single np.take pass)
    z = _ZIGZAG_LUT[d.reshape(-1)]
    n = z.size
    escape = np.uint8((1 << bits) - 1)
    esc_mask = z >= escape
    overflow = z[esc_mask]
    bucket = max(_MIN_OVERFLOW_BUCKET, _next_pow2(len(overflow)))
    wire = (n * bits + 7) // 8 + bucket
    if wire >= n:          # incompressible batch: ship raw, stay lossless
        return None
    # escape is the MAX base code, so clipping IS the escape substitution
    base = np.minimum(z, escape)
    packed = _pack_bits(base, bits)
    overflow = np.concatenate(
        [overflow, np.zeros(bucket - len(overflow), np.uint8)])
    return {"packed": packed, "overflow": overflow,
            "shape": tuple(x.shape), "bits": bits, "axis": axis}


def wire_bytes(payload: Optional[Dict[str, np.ndarray]]) -> int:
    """Bytes this payload puts on the host->device wire."""
    if payload is None:
        return 0
    return payload["packed"].nbytes + payload["overflow"].nbytes


def decode_u8(packed, overflow, shape, bits: int, axis: int):
    """Jittable device-side decoder (pure function of arrays + statics)."""
    import jax.numpy as jnp

    n = int(np.prod(shape))
    if bits in (2, 4):
        group = 8 // bits
        shifts = jnp.arange(group, dtype=jnp.uint8) * np.uint8(bits)
        base = (packed[:, None] >> shifts[None, :]) \
            & np.uint8((1 << bits) - 1)
        base = base.reshape(-1)[:n]
    else:  # bits=3: 3 bytes -> 8 codes via one little-endian u32 word
        b = packed.reshape(-1, 3).astype(jnp.uint32)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        shifts = jnp.arange(8, dtype=jnp.uint32) * 3
        base = ((word[:, None] >> shifts[None, :]) & 7).astype(jnp.uint8)
        base = base.reshape(-1)[:n]
    escape = np.uint8((1 << bits) - 1)
    esc = base == escape
    # the i-th escape position (in order) takes the i-th overflow byte
    ranks = jnp.cumsum(esc.astype(jnp.int32)) - 1
    ranks = jnp.clip(ranks, 0, overflow.shape[0] - 1)
    z = jnp.where(esc, overflow[ranks], base)
    zi = z.astype(jnp.int16)
    s = (zi >> 1) ^ -(zi & 1)                     # un-zigzag
    d = s.astype(jnp.uint8).reshape(shape)        # mod-256 deltas
    # integrate along the delta axis; mod distributes over the running sum
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
              jax.device_put(payload["overflow"]))


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
