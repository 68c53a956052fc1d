"""Video IO, conversion and mesh-distributed frame processing.

The reference planned "find best performing video loading library ...
implement video processing tooling (convertion, preprocessing, image
pipeline application, input and target interpolation, distributed video
processing, ...)" and "utilities to convert files to our codec for faster
processing" (reference README.md:162-166, 157-161) — all pure TODOs there.
TPU-first build, zero new dependencies:

- **Y4M (YUV4MPEG2)** reader/writer in stdlib+numpy. Y4M is the
  uncompressed interchange format every video tool speaks (ffmpeg, mpv,
  x264 pipe in/out of it), so real video enters and leaves the framework
  without bundling a decoder. Parsing is a one-line header + fixed-size
  planar frames — reading is a single `np.frombuffer` per frame, and the
  reader is a GENERATOR: larger-than-RAM videos stream at constant memory.
  BT.601 studio-swing YUV <-> RGB with vectorized numpy; C444 and the
  C420 family (box-filtered 4:2:0).
- **Conversion**: `y4m_to_memmap` streams a video straight into the
  framework's memmap layout (the zero-copy training path), and
  `write_dvv`/`read_dvv`/`iter_dvv` put clips through the learned
  `LosslessVideoCodec` into a length-prefixed container file — the
  reference codec TODO's "utilities to convert files to our codec".
- **Distributed video processing**: `process_video` maps any jitted
  per-batch function (a model forward, a preprocess chain, the augment
  stack) over all frames with each batch SHARDED over the mesh's data
  axis — frames ride ICI across chips, the tail batch is padded and
  trimmed, and results come back as one host array. The reference's
  'distributed video processing' bullet, expressed as sharding
  annotations instead of a worker fleet.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable, Iterator, Optional, Sequence, Tuple, \
    Union

import numpy as np

__all__ = ["Y4MMeta", "iter_y4m", "read_y4m", "write_y4m", "rgb_to_ycbcr",
           "ycbcr_to_rgb", "y4m_to_memmap", "write_dvv", "read_dvv",
           "iter_dvv", "process_video"]


# --------------------------------------------------------------------------- #
# BT.601 studio-swing color conversion (the Y4M default)
# --------------------------------------------------------------------------- #

_RGB2YCC = np.array([[65.738, 129.057, 25.064],
                     [-37.945, -74.494, 112.439],
                     [112.439, -94.154, -18.285]]) / 256.0
_YCC_OFFSET = np.array([16.0, 128.0, 128.0])


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) RGB -> uint8 (..., 3) BT.601 studio-swing Y'CbCr."""
    ycc = rgb.astype(np.float64) @ _RGB2YCC.T + _YCC_OFFSET
    return np.clip(np.rint(ycc), 0, 255).astype(np.uint8)


_YCC2RGB = np.linalg.inv(_RGB2YCC)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rgb_to_ycbcr` (clipped; roundtrip is within ~2 u8
    levels — studio-swing quantization is lossy by construction)."""
    rgb = (ycc.astype(np.float64) - _YCC_OFFSET) @ _YCC2RGB.T
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------- #
# YUV4MPEG2
# --------------------------------------------------------------------------- #

@dataclass(frozen=True)
class Y4MMeta:
    width: int
    height: int
    fps: Tuple[int, int] = (25, 1)
    chroma: str = "420jpeg"
    interlace: str = "p"
    aspect: Tuple[int, int] = (1, 1)

    @property
    def frame_bytes(self) -> int:
        # EXACT tag matching: prefix matching would accept 10/16-bit or
        # alpha variants (C420p10, C444alpha, ...) and silently misparse
        # their 2-bytes/sample or 4-plane frames as 8-bit 3-plane data.
        y = self.width * self.height
        if self.chroma == "444":
            return 3 * y
        if self.chroma in ("420", "420jpeg", "420mpeg2", "420paldv"):
            # the three 420 sitings share one plane layout; we up/downsample
            # with centered (jpeg) siting for all of them — reading
            # mpeg2/paldv-sited chroma is off by at most half a sample
            return y + 2 * ((self.width // 2) * (self.height // 2))
        raise ValueError(f"unsupported Y4M chroma 'C{self.chroma}' "
                         "(supported: 444, 420, 420jpeg, 420mpeg2, "
                         "420paldv — 8-bit, no alpha)")


def _parse_y4m_header(line: bytes) -> Y4MMeta:
    parts = line.decode("ascii", "replace").strip().split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    kw = {"chroma": "420jpeg"}
    for tok in parts[1:]:
        if not tok:
            continue
        tag, val = tok[0], tok[1:]
        if tag == "W":
            kw["width"] = int(val)
        elif tag == "H":
            kw["height"] = int(val)
        elif tag == "F":
            n, d = val.split(":")
            kw["fps"] = (int(n), int(d))
        elif tag == "I":
            kw["interlace"] = val
        elif tag == "A":
            n, d = val.split(":")
            kw["aspect"] = (int(n), int(d))
        elif tag == "C":
            kw["chroma"] = val
        # X comment tags are ignored
    if "width" not in kw or "height" not in kw:
        raise ValueError(f"Y4M header missing W/H: {line!r}")
    meta = Y4MMeta(**kw)
    if meta.interlace not in ("p", "?"):
        raise ValueError(f"interlaced Y4M (I{meta.interlace}) not supported")
    meta.frame_bytes  # validate chroma early
    return meta


def _planes_to_rgb(buf: bytes, meta: Y4MMeta) -> np.ndarray:
    w, h = meta.width, meta.height
    y = np.frombuffer(buf, np.uint8, w * h).reshape(h, w)
    if meta.chroma.startswith("444"):
        cb = np.frombuffer(buf, np.uint8, w * h, w * h).reshape(h, w)
        cr = np.frombuffer(buf, np.uint8, w * h, 2 * w * h).reshape(h, w)
    else:                                   # 4:2:0 -> nearest upsample
        cw, ch = w // 2, h // 2
        cb = np.frombuffer(buf, np.uint8, cw * ch, w * h).reshape(ch, cw)
        cr = np.frombuffer(buf, np.uint8, cw * ch, w * h + cw * ch
                           ).reshape(ch, cw)
        cb = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w]
        cr = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w]
    return ycbcr_to_rgb(np.stack([y, cb, cr], axis=-1))


def _rgb_to_planes(frame: np.ndarray, meta: Y4MMeta) -> bytes:
    ycc = rgb_to_ycbcr(frame)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if meta.chroma.startswith("444"):
        return y.tobytes() + cb.tobytes() + cr.tobytes()
    h, w = y.shape                           # 4:2:0 -> 2x2 box downsample
    def down(c):
        c = c.astype(np.uint16).reshape(h // 2, 2, w // 2, 2)
        return ((c.sum((1, 3)) + 2) // 4).astype(np.uint8)
    return y.tobytes() + down(cb).tobytes() + down(cr).tobytes()


def iter_y4m(path: Union[str, Path]) -> Tuple[Y4MMeta,
                                              Iterator[np.ndarray]]:
    """Open a .y4m file: returns (meta, generator of uint8 (H, W, 3) RGB
    frames). The generator reads one frame at a time — constant memory on
    larger-than-RAM videos."""
    f = open(path, "rb")
    try:
        meta = _parse_y4m_header(f.readline())
    except BaseException:
        f.close()                # don't leak the fd on a malformed header
        raise

    def frames():
        with f:
            while True:
                marker = f.readline()
                if not marker:
                    return
                if not marker.startswith(b"FRAME"):
                    raise ValueError(f"bad frame marker {marker[:16]!r}")
                buf = f.read(meta.frame_bytes)
                if len(buf) != meta.frame_bytes:
                    raise ValueError("truncated Y4M frame")
                yield _planes_to_rgb(buf, meta)

    return meta, frames()


def read_y4m(path: Union[str, Path], limit: Optional[int] = None
             ) -> Tuple[np.ndarray, Y4MMeta]:
    """Read a .y4m file into a (T, H, W, 3) uint8 RGB array."""
    if limit is not None and limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    meta, gen = iter_y4m(path)
    out = []
    for i, frame in enumerate(gen):
        if limit is not None and i >= limit:
            break
        out.append(frame)
    if not out:
        raise ValueError(f"no frames in {path}")
    return np.stack(out), meta


def write_y4m(path: Union[str, Path], frames: Iterable[np.ndarray],
              fps: Tuple[int, int] = (25, 1), chroma: str = "420jpeg",
              ) -> Y4MMeta:
    """Write uint8 RGB frames ((T, H, W, 3) array or any iterable of
    (H, W, 3)) as a .y4m file any video tool can consume. Streams: frames
    are converted and written one at a time. Writing allows only the
    sitings we actually produce ('444', '420jpeg' centered chroma) — a
    '420mpeg2' tag over jpeg-sited planes would promise co-sited chroma we
    didn't write."""
    if chroma not in ("444", "420jpeg"):
        raise ValueError(f"write_y4m emits C444 or C420jpeg, got "
                         f"'{chroma}'")
    it = iter(frames)
    try:
        first = next(it)
    except StopIteration:
        raise ValueError("write_y4m: no frames") from None
    first = np.asarray(first, np.uint8)
    h, w = first.shape[:2]
    if chroma.startswith("420") and (h % 2 or w % 2):
        raise ValueError(f"4:2:0 needs even dimensions, got {h}x{w}")
    meta = Y4MMeta(width=w, height=h, fps=fps, chroma=chroma)
    header = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
              f"C{chroma}\n").encode("ascii")
    with open(path, "wb") as f:
        f.write(header)
        for frame in _chain_one(first, it):
            frame = np.asarray(frame, np.uint8)
            if frame.shape[:2] != (h, w):
                raise ValueError(f"frame shape {frame.shape[:2]} != first "
                                 f"frame's ({h}, {w})")
            f.write(b"FRAME\n")
            f.write(_rgb_to_planes(frame, meta))
    return meta


def _chain_one(first, rest):
    yield first
    yield from rest


# --------------------------------------------------------------------------- #
# Conversion: Y4M -> memmap (training path), clips -> learned-codec container
# --------------------------------------------------------------------------- #

def y4m_to_memmap(src: Union[str, Path], out_path: Union[str, Path],
                  ) -> np.memmap:
    """Stream a .y4m straight into a .npy memmap of uint8 (T, H, W, 3)
    frames — the framework's zero-copy larger-than-RAM layout (same format
    `materialize_image_folder_to_memmap` produces for images). Two passes
    are avoided by counting frames from the FILE SIZE (Y4M frames are
    fixed-size), so the memmap is allocated once and filled streaming."""
    src, out_path = Path(src), Path(out_path)
    meta, gen = iter_y4m(src)
    with open(src, "rb") as f:
        header_len = len(f.readline())
    per_frame = len(b"FRAME\n") + meta.frame_bytes
    n = (src.stat().st_size - header_len) // per_frame
    if n <= 0:
        raise ValueError(f"no frames in {src}")
    mm = np.lib.format.open_memmap(out_path, mode="w+", dtype=np.uint8,
                                   shape=(n, meta.height, meta.width, 3))
    t = 0
    try:
        for frame in gen:
            mm[t] = frame
            t += 1
        if t != n:
            raise ValueError(f"frame count mismatch: sized for {n}, read "
                             f"{t} (per-frame FRAME parameters are not "
                             "supported)")
    except BaseException:
        del mm                      # close before removing the partial file
        out_path.unlink(missing_ok=True)
        raise
    mm.flush()
    return mm


_DVV_FILE_MAGIC = b"DCVF"


def write_dvv(path: Union[str, Path], clips: Iterable[np.ndarray], codec,
              ) -> int:
    """Compress clips through a fitted :class:`~deepcv_tpu.codec.
    LosslessVideoCodec` into a container file ('utilities to convert files
    to our codec', reference README.md:161). Layout: magic | u8 n_scales |
    u16 H W | u8 C | per clip: u32 length + codec stream. Returns the
    number of clips written; streams (one clip encoded+written at a
    time)."""
    h, w, c = codec.frame_shape
    n = 0
    with open(path, "wb") as f:
        f.write(_DVV_FILE_MAGIC)
        f.write(struct.pack("<BHHB", codec.intra.n_scales, h, w, c))
        for clip in clips:
            blob = codec.encode_clip(np.asarray(clip, np.uint8))
            f.write(struct.pack("<I", len(blob)))
            f.write(blob)
            n += 1
    return n


def iter_dvv(path: Union[str, Path], codec) -> Iterator[np.ndarray]:
    """Stream decoded (T, H, W, C) uint8 clips from a .dvv container."""
    with open(path, "rb") as f:
        if f.read(4) != _DVV_FILE_MAGIC:
            raise ValueError("not a deepcv video container")
        n_scales, h, w, c = struct.unpack("<BHHB", f.read(6))
        if ((h, w, c) != tuple(codec.frame_shape)
                or n_scales != codec.intra.n_scales):
            raise ValueError(f"container is {h}x{w}x{c}/{n_scales} scales; "
                             f"codec is {codec.frame_shape}/"
                             f"{codec.intra.n_scales}")
        while True:
            head = f.read(4)
            if not head:
                return
            if len(head) != 4:
                raise ValueError("truncated .dvv container (cut inside a "
                                 "clip length prefix)")
            (ln,) = struct.unpack("<I", head)
            blob = f.read(ln)
            if len(blob) != ln:
                raise ValueError(f"truncated .dvv container (clip needs "
                                 f"{ln} bytes, {len(blob)} present)")
            yield codec.decode_clip(blob)


def read_dvv(path: Union[str, Path], codec) -> np.ndarray:
    """Read a whole .dvv container -> (N, T, H, W, C) uint8 (clips must
    share one length; use :func:`iter_dvv` for ragged clips)."""
    clips = list(iter_dvv(path, codec))
    if not clips:
        raise ValueError(f"no clips in {path}")
    return np.stack(clips)


# --------------------------------------------------------------------------- #
# Distributed frame processing
# --------------------------------------------------------------------------- #

def process_video(frames: Union[np.ndarray, Iterable[np.ndarray]],
                  fn: Callable, *, batch_size: int = 32,
                  mesh=None, axis: str = "data",
                  preprocess: Optional[Callable] = None) -> np.ndarray:
    """Map a per-batch function over every frame of a video, each batch
    sharded across the mesh ('distributed video processing', reference
    README.md:163).

    ``fn(batch (B, H, W, ...)) -> (B, ...)`` — a jitted model forward, a
    preprocess chain, an augmentation stack. With a ``mesh``, every batch
    is device_put with the batch dim sharded over ``axis`` BEFORE ``fn``
    runs, so XLA executes each call data-parallel across the mesh's chips.
    The loop keeps ONE batch in flight: it dispatches batch k (async),
    prepares and dispatches batch k+1, and only then blocks on k's result
    — host decode/transfer of the next batch overlaps device compute of
    the current one. The tail batch is padded by repeating the last frame
    and trimmed after. ``frames`` may be an array or any frame iterator
    (e.g. straight from :func:`iter_y4m`); ``preprocess`` (host side, e.g.
    dtype conversion) applies per batch before sharding. Returns the
    stacked host results (T, ...)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if mesh is not None:
        n_shards = mesh.shape[axis]
        if batch_size % n_shards:
            raise ValueError(f"batch_size {batch_size} must be divisible by "
                             f"mesh axis '{axis}' size {n_shards}")
        sharding = NamedSharding(mesh, PartitionSpec(axis))
    else:
        sharding = None

    def dispatch(batch: np.ndarray) -> Tuple[object, int]:
        """Async: pad + preprocess + shard + launch fn; no host sync."""
        real = batch.shape[0]
        if real < batch_size:                      # pad tail, trim after
            pad = np.repeat(batch[-1:], batch_size - real, axis=0)
            batch = np.concatenate([batch, pad])
        if preprocess is not None:
            batch = preprocess(batch)
        x = jax.device_put(batch, sharding) if sharding is not None else batch
        return fn(x), real

    if isinstance(frames, np.ndarray):
        chunks = (frames[i:i + batch_size]
                  for i in range(0, len(frames), batch_size))
    else:
        def chunked():
            buf = []
            for fr in frames:
                buf.append(np.asarray(fr))
                if len(buf) == batch_size:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)
        chunks = chunked()

    outs = []
    pending = None                 # one batch in flight (double buffering)
    for chunk in chunks:
        launched = dispatch(chunk)
        if pending is not None:
            y, real = pending
            outs.append(np.asarray(y)[:real])      # blocks on batch k-1
        pending = launched
    if pending is None:
        raise ValueError("process_video: no frames")
    y, real = pending
    outs.append(np.asarray(y)[:real])
    return np.concatenate(outs)
