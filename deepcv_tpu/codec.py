"""Learned lossless image codec (L3C-style hierarchical context modeling).

The reference planned a "custom lossless image and video compression codec
using learned arithmetic encoder policies" with L3C (arXiv:1811.12817) as
the benchmark (/root/reference/README.md:157-161) — nothing was built.
This is the TPU-native take:

  * The image forms a SUBSAMPLE PYRAMID: level ``l+1`` is level ``l``'s
    top-left 2x2 phase, so the coarsest level plus three "detail" phases
    per level reconstruct the image exactly.
  * A small CNN per phase (weights SHARED across levels — image statistics
    are scale-similar) predicts a 256-way distribution for every detail
    pixel from the already-known planes: phase 1 sees the coarse image,
    phase 2 sees coarse+phase1, phase 3 sees all three. All pixels of a
    phase are modeled in ONE batched forward — no pixel-sequential
    autoregression, so the probability model runs at full MXU utilization
    (the L3C insight, reshaped for XLA).
  * The train objective IS the code length: mean negative log2-likelihood
    in bits per subpixel. The entropy coder (runtime/range_coder.py — C++
    with a bit-identical Python fallback) then realizes that rate to
    within a few bytes per block.

Bitstreams decode with the same params on the same backend; like every
learned codec, cross-platform float divergence can break arithmetic-coder
sync (L3C ships integer-arithmetic tricks for this; out of scope here —
the oracle is the roundtrip test).
"""
from __future__ import annotations

import struct
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepcv_tpu.runtime.range_coder import TOTAL, rc_decode, rc_encode

__all__ = ["LosslessCodec", "LosslessVideoCodec", "quantize_cdf"]

_MAGIC = b"DCVC"
#: detail-phase offsets within each 2x2 cell; (0, 0) is the coarse phase
_PHASES = ((0, 1), (1, 0), (1, 1))


def quantize_cdf(probs: np.ndarray) -> np.ndarray:
    """float probabilities (N, K) -> uint32 CDF rows (N, K+1), total 2^16,
    every symbol >= 1/2^16 (the coder cannot represent zero mass).
    Deterministic — encoder and decoder MUST build identical tables."""
    p = np.asarray(probs, np.float64)
    n, k = p.shape
    p = np.maximum(p, 1e-12)
    p /= p.sum(axis=1, keepdims=True)
    f = np.floor(p * (TOTAL - k)).astype(np.uint32) + 1     # sum <= TOTAL
    f[np.arange(n), p.argmax(axis=1)] += (TOTAL - f.sum(axis=1)).astype(np.uint32)
    cdf = np.zeros((n, k + 1), dtype=np.uint32)
    np.cumsum(f, axis=1, out=cdf[:, 1:], dtype=np.uint32)
    return cdf


class _PhaseNet(fnn.Module):
    """Context CNN for one detail phase: known planes -> per-pixel,
    per-channel 256-way logits. Receptive field 5x5 on the half-res grid
    (~11x11 at the phase's own resolution) — local context, like L3C's
    per-scale predictors."""
    channels: int
    hidden: int
    symbols: int

    @fnn.compact
    def __call__(self, x):                       # (B, h, w, Cin) float
        h = fnn.relu(fnn.Conv(self.hidden, (3, 3))(x))
        h = fnn.relu(fnn.Conv(self.hidden, (3, 3))(h))
        h = fnn.Conv(self.channels * self.symbols, (1, 1))(h)
        return h.reshape((*h.shape[:-1], self.channels, self.symbols))


class _PyramidModel(fnn.Module):
    channels: int
    hidden: int
    symbols: int
    n_scales: int

    def setup(self):
        # one net per PHASE, shared across scales: input channel counts are
        # C (coarse), 2C (+phase1), 3C (+phase2)
        self.phase_nets = [
            _PhaseNet(self.channels, self.hidden, self.symbols, name=f"phase{i}")
            for i in range(3)]

    def _norm(self, u8):
        return u8.astype(jnp.float32) / (self.symbols - 1) * 2.0 - 1.0

    def phase_logits(self, known: Sequence[jnp.ndarray], phase: int):
        """known: list of uint8 planes (B, h, w, C) — coarse first, then
        already-coded phases. Returns (B, h, w, C, symbols) logits."""
        x = jnp.concatenate([self._norm(k) for k in known], axis=-1)
        return self.phase_nets[phase](x)

    def __call__(self, images):                  # (B, H, W, C) uint8
        """Total model code length in BITS for the detail pixels of every
        level (the coarsest level is stored raw, 8 bits/subpixel)."""
        x = images
        bits = 0.0
        for _ in range(self.n_scales):
            coarse = x[:, 0::2, 0::2, :]
            known = [coarse]
            for p, (dy, dx) in enumerate(_PHASES):
                target = x[:, dy::2, dx::2, :]
                logits = self.phase_logits(known, p)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, target.astype(jnp.int32)[..., None], axis=-1)
                bits += jnp.sum(nll) / jnp.log(2.0)
                known.append(target)
            x = coarse
        return bits


class LosslessCodec:
    """Train-encode-decode facade over the pyramid model + range coder.

    ``encode``/``decode`` are exact inverses (bit-exact images); the
    realized file size tracks ``bits_per_dim`` to coder overhead
    (~4 bytes per phase block).
    """

    def __init__(self, image_shape: Tuple[int, int, int], *, n_scales: int = 2,
                 hidden: int = 32, symbols: int = 256, seed: int = 0,
                 coding_batch: int = 16):
        h, w, c = image_shape
        if h % (1 << n_scales) or w % (1 << n_scales):
            raise ValueError(f"image dims {h}x{w} must be divisible by "
                             f"2^n_scales = {1 << n_scales}")
        self.image_shape = (h, w, c)
        self.n_scales = int(n_scales)
        self.symbols = int(symbols)
        self._coding_batch = max(1, int(coding_batch))
        self.model = _PyramidModel(channels=c, hidden=hidden, symbols=symbols,
                                   n_scales=self.n_scales)
        probe = jnp.zeros((1, h, w, c), dtype=jnp.uint8)
        self.params = self.model.init(jax.random.PRNGKey(seed), probe)["params"]
        self._jit_logits: Dict[Tuple, Any] = {}
        self._jit_bits = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    # ------------------------------------------------------------ training
    def fit(self, images: np.ndarray, *, steps: int = 300, batch_size: int = 16,
            lr: float = 3e-3, seed: int = 0, log_every: int = 0) -> List[float]:
        """MLE training: minimize mean bits/subpixel of the detail phases.
        Self-contained optax loop — the codec has no targets/metrics/eval
        protocol for the classification training runtime to manage."""
        h, w, c = self.image_shape
        tx = optax.adamw(lr)
        opt_state = tx.init(self.params)
        eff_batch = min(batch_size, len(images))
        denom = eff_batch * h * w * c  # normalize by ACTUAL rows per step

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                return self.model.apply({"params": p}, batch) / denom
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(seed)
        images = np.asarray(images, np.uint8)
        history = []
        params = self.params
        for i in range(steps):
            idx = rng.choice(len(images), size=eff_batch, replace=False)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(images[idx]))
            history.append(float(loss))
            if log_every and (i + 1) % log_every == 0:
                print(f"codec step {i + 1}/{steps}: {history[-1]:.3f} bits/subpixel")
        self.params = params
        return history

    # ------------------------------------------------------------ rate math
    def bits_per_dim(self, images: np.ndarray) -> float:
        """Model rate in bits/subpixel including the raw coarsest level."""
        x = jnp.asarray(np.asarray(images, np.uint8))
        h, w, c = self.image_shape
        top = (h >> self.n_scales) * (w >> self.n_scales) * c * 8 * len(x)
        return (float(self._jit_bits(self.params, x)) + top) / x.size

    # ------------------------------------------------------------ coding
    def _logits_fn(self, phase: int, shapes: Tuple):
        key = (phase, shapes)
        if key not in self._jit_logits:
            self._jit_logits[key] = jax.jit(
                lambda p, known: self.model.apply(
                    {"params": p}, known, phase,
                    method=_PyramidModel.phase_logits))
        return self._jit_logits[key]

    def _phase_cdf(self, known: List[np.ndarray], phase: int) -> np.ndarray:
        """known: batched uint8 planes (B, h, w, C) -> per-image CDF rows
        (B, h*w*C, K+1). The probability model always runs at the FIXED
        internal batch size ``coding_batch`` (tail tiled with the last real
        row), so encoder and decoder execute the SAME compiled XLA program
        no matter what batch size each caller uses — a different program
        shape could reorder float accumulation by 1 ulp across a CDF
        quantization boundary and silently desync the range coder. The
        sequential range coder is per image; the model dispatch is batched
        in chunks of ``coding_batch``."""
        b = known[0].shape[0]
        cb = self._coding_batch
        fn = self._logits_fn(phase, tuple((cb, *k.shape[1:]) for k in known))
        prob_rows = []
        for start in range(0, b, cb):
            chunk = [k[start:start + cb] for k in known]
            pad = cb - chunk[0].shape[0]
            if pad:
                chunk = [np.concatenate([k, np.repeat(k[-1:], pad, axis=0)])
                         for k in chunk]
            logits = fn(self.params, [jnp.asarray(k) for k in chunk])
            probs = np.asarray(jax.nn.softmax(logits, axis=-1), np.float64)
            prob_rows.append(probs[:cb - pad] if pad else probs)
        probs = np.concatenate(prob_rows)
        return quantize_cdf(probs.reshape(-1, self.symbols)).reshape(
            b, -1, self.symbols + 1)

    def encode(self, image: np.ndarray) -> bytes:
        """uint8 (H, W, C) -> bitstream. Layout: magic | n_scales | raw
        coarsest level | per level (coarse->fine), per phase:
        u32 length + range-coded block."""
        return self.encode_batch(np.asarray(image, np.uint8)[None])[0]

    def encode_batch(self, images: np.ndarray) -> List[bytes]:
        """Encode (B, H, W, C): per-image bitstreams identical to
        :meth:`encode`'s, but every phase's probabilities come from one
        batched forward."""
        images = np.ascontiguousarray(images, np.uint8)
        if images.shape[1:] != self.image_shape:
            raise ValueError(f"expected {self.image_shape}, got {images.shape[1:]}")
        levels = [images]
        for _ in range(self.n_scales):
            levels.append(levels[-1][:, 0::2, 0::2, :])
        header = _MAGIC + struct.pack("<BHHB", self.n_scales, *self.image_shape)
        outs = [[header, top.tobytes()] for top in levels[-1]]
        for lvl in range(self.n_scales - 1, -1, -1):
            known = [levels[lvl + 1]]
            for p, (dy, dx) in enumerate(_PHASES):
                target = levels[lvl][:, dy::2, dx::2, :]
                cdf = self._phase_cdf(known, p)
                for i, out in enumerate(outs):
                    blob = rc_encode(target[i].reshape(-1).astype(np.uint16),
                                     cdf[i])
                    out.append(struct.pack("<I", len(blob)))
                    out.append(blob)
                known.append(target)
        return [b"".join(out) for out in outs]

    def decode(self, data: bytes) -> np.ndarray:
        return self.decode_batch([data])[0]

    def _decode_levels(self, streams: Sequence[bytes]):
        """Sequential decode, one completed pyramid level at a time.

        Yields ``(level, planes (B, H>>level, W>>level, C), bytes_consumed
        per stream)`` after the raw coarsest level and after each coded
        level completes — the engine behind both :meth:`decode_batch` and
        the progressive-loading surface (the bitstream is coarse->fine, so
        every yield depends only on a PREFIX of the stream)."""
        h, w, c = self.image_shape
        positions = []
        for data in streams:
            if data[:4] != _MAGIC:
                raise ValueError("not a deepcv codec stream")
            meta = struct.unpack_from("<BHHB", data, 4)
            if meta != (self.n_scales, h, w, c):
                raise ValueError(f"stream is {meta[1]}x{meta[2]}x{meta[3]}/"
                                 f"{meta[0]} scales; codec is "
                                 f"{self.image_shape}/{self.n_scales}")
            positions.append(4 + struct.calcsize("<BHHB"))
        b = len(streams)
        th, tw = h >> self.n_scales, w >> self.n_scales
        top_n = th * tw * c
        x = np.stack([np.frombuffer(s, np.uint8, top_n, positions[i])
                      .reshape(th, tw, c) for i, s in enumerate(streams)])
        positions = [pos + top_n for pos in positions]
        yield self.n_scales, x, list(positions)
        for lvl in range(self.n_scales - 1, -1, -1):
            hh, ww = h >> lvl, w >> lvl
            fine = np.zeros((b, hh, ww, c), np.uint8)
            fine[:, 0::2, 0::2, :] = x
            known = [x]
            for p, (dy, dx) in enumerate(_PHASES):
                cdf = self._phase_cdf(known, p)
                plane = np.empty((b, hh // 2, ww // 2, c), np.uint8)
                for i, s in enumerate(streams):
                    (ln,) = struct.unpack_from("<I", s, positions[i])
                    positions[i] += 4
                    syms = rc_decode(s[positions[i]:positions[i] + ln],
                                     cdf.shape[1], cdf[i])
                    positions[i] += ln
                    plane[i] = syms.astype(np.uint8).reshape(hh // 2, ww // 2, c)
                fine[:, dy::2, dx::2, :] = plane
                known.append(plane)
            x = fine
            yield lvl, x, list(positions)

    def decode_batch(self, streams: Sequence[bytes]) -> np.ndarray:
        """Decode same-shape bitstreams; phase CNNs batch across streams
        (decoding stays sequential only across phases, as it must)."""
        for _, x, _ in self._decode_levels(streams):
            pass
        return x

    def decode_progressive(self, data: bytes):
        """Progressive loading (the reference codec TODO's 'possibility of
        progressive image/frame loading/streaming', README.md:159): yields
        ``{'level', 'scale', 'image', 'bytes_consumed', 'final'}`` after
        each pyramid level, coarse to fine. ``image`` is always full
        resolution (nearest-upsampled preview; the last yield is the exact
        decode), so a UI can paint every yield in place. Each preview
        consumed only the stream PREFIX reported in ``bytes_consumed``."""
        for lvl, x, pos in self._decode_levels([data]):
            s = 1 << lvl
            preview = np.repeat(np.repeat(x[0], s, axis=0), s, axis=1)
            yield {"level": lvl, "scale": s, "image": preview,
                   "bytes_consumed": pos[0], "final": lvl == 0}

    def _finest_complete_level(self, data: bytes) -> int:
        """Walk the length-prefixed block layout (no decoding) and return
        the finest level whose bytes are FULLY present in ``data``."""
        h, w, c = self.image_shape
        pos = (4 + struct.calcsize("<BHHB")
               + (h >> self.n_scales) * (w >> self.n_scales) * c)
        if len(data) < pos:
            raise ValueError("truncated before the coarsest level "
                             f"({len(data)} bytes)")
        complete = self.n_scales
        for lvl in range(self.n_scales - 1, -1, -1):
            for _ in _PHASES:
                if pos + 4 > len(data):
                    return complete
                (ln,) = struct.unpack_from("<I", data, pos)
                pos += 4 + ln
                if pos > len(data):
                    return complete
            complete = lvl
        return complete

    def decode_partial(self, data: bytes) -> Tuple[np.ndarray, int]:
        """Best full-resolution preview from a possibly TRUNCATED stream —
        the streaming story: a byte prefix renders at the finest level it
        fully contains. Returns (preview uint8 (H, W, C), finest completed
        level; 0 = exact full decode). Raises on a stream too short for
        even the raw coarsest level. The lazy level generator stops AT the
        last complete level, so the truncated tail is never parsed."""
        target = self._finest_complete_level(data)
        for out in self.decode_progressive(data):
            if out["level"] == target:
                return out["image"], out["level"]
        raise AssertionError("unreachable: target level not yielded")

    # ------------------------------------------------------------ benchmark
    def evaluate(self, images: np.ndarray, *, n_code: int = 4) -> Dict[str, float]:
        """Honest rate report: model bits/dim over ``images``, REALIZED
        bytes for the first ``n_code`` images, and PNG + raw baselines."""
        images = np.asarray(images, np.uint8)
        bpd = self.bits_per_dim(images)
        sizes = [len(s) for s in self.encode_batch(images[:n_code])]
        png_sizes = [_png_bytes(img) for img in images[:n_code]]
        per_image = int(np.prod(self.image_shape))
        out = {"bits_per_dim": bpd, "raw_bits_per_dim": 8.0,
               "coded_bits_per_dim": float(np.mean(sizes)) * 8 / per_image,
               "coded_bytes_mean": float(np.mean(sizes))}
        if png_sizes and png_sizes[0] >= 0:
            out["png_bytes_mean"] = float(np.mean(png_sizes))
            out["vs_png"] = out["png_bytes_mean"] / out["coded_bytes_mean"]
        return out


def _png_bytes(img: np.ndarray) -> int:
    """PNG size baseline via PIL (present for the augmentation oracles);
    -1 when unavailable."""
    try:
        import io

        from PIL import Image
    except ImportError:  # pragma: no cover
        return -1
    buf = io.BytesIO()
    mode = "RGB" if img.shape[-1] == 3 else "L"
    arr = img if img.shape[-1] == 3 else img[..., 0]
    Image.fromarray(arr, mode=mode).save(buf, format="PNG", optimize=True)
    return buf.getbuffer().nbytes


# --------------------------------------------------------------------------- #
# Video extension (the reference TODO asks for "image and video sizes",
# README.md:157-161). Two per-frame coding modes, the classic intra/inter
# split shaped for losslessness:
#   * intra — the frame through the image codec above;
#   * inter — the MODULO-256 temporal residual (f_t - f_{t-1}) % 256 through
#     a SECOND pyramid codec trained on residuals. uint8 wraparound is a
#     bijection, so inter frames reconstruct bit-exactly from the previous
#     decoded frame; residuals of correlated video concentrate near 0 and
#     code far below 8 bits/subpixel.
# The encoder codes every frame BOTH ways (each a batched dispatch across
# the clip — the 2x probability-model cost is the standard mode-search
# trade) and keeps the smaller stream; a 1-byte flag tells the decoder.
# --------------------------------------------------------------------------- #

class LosslessVideoCodec:
    """Lossless video codec: per-frame intra/inter over two pyramid models.

    ``encode_clip``/``decode_clip`` are exact inverses for (T, H, W, C)
    uint8 clips. Frame 0 is always intra; later frames pick the cheaper of
    intra and modulo-256-residual inter coding by realized size.
    """

    _VMAGIC = b"DCVV"

    def __init__(self, frame_shape: Tuple[int, int, int], *, n_scales: int = 2,
                 hidden: int = 32, symbols: int = 256, seed: int = 0,
                 coding_batch: int = 16):
        self.frame_shape = tuple(frame_shape)
        self.intra = LosslessCodec(frame_shape, n_scales=n_scales,
                                   hidden=hidden, symbols=symbols, seed=seed,
                                   coding_batch=coding_batch)
        self.inter = LosslessCodec(frame_shape, n_scales=n_scales,
                                   hidden=hidden, symbols=symbols,
                                   seed=seed + 1, coding_batch=coding_batch)

    @staticmethod
    def _residuals(clips: np.ndarray) -> np.ndarray:
        c = clips.astype(np.int16)
        return ((c[:, 1:] - c[:, :-1]) % 256).astype(np.uint8)

    def fit(self, clips: np.ndarray, *, steps: int = 300, batch_size: int = 16,
            lr: float = 3e-3, seed: int = 0, log_every: int = 0
            ) -> Dict[str, List[float]]:
        """Train the intra model on frames and the inter model on temporal
        residuals of ``clips`` (N, T, H, W, C) uint8."""
        clips = np.asarray(clips, np.uint8)
        if clips.ndim != 5 or clips.shape[1] < 2:
            raise ValueError(f"expected (N, T>=2, H, W, C) clips, got "
                             f"{clips.shape}")
        frames = clips.reshape((-1,) + clips.shape[2:])
        res = self._residuals(clips).reshape((-1,) + clips.shape[2:])
        return {"intra": self.intra.fit(frames, steps=steps,
                                        batch_size=batch_size, lr=lr,
                                        seed=seed, log_every=log_every),
                "inter": self.inter.fit(res, steps=steps,
                                        batch_size=batch_size, lr=lr,
                                        seed=seed + 1, log_every=log_every)}

    def encode_clip(self, clip: np.ndarray) -> bytes:
        """(T, H, W, C) uint8 -> bitstream. Layout: magic | u16 T | per
        frame: u8 mode (0=intra, 1=inter) + u32 length + image-codec
        stream."""
        clip = np.ascontiguousarray(clip, np.uint8)
        if clip.ndim != 4 or clip.shape[1:] != self.frame_shape:
            raise ValueError(f"expected (T, *{self.frame_shape}) clip, got "
                             f"{clip.shape}")
        t = clip.shape[0]
        intra_streams = self.intra.encode_batch(clip)
        inter_streams = self.inter.encode_batch(
            self._residuals(clip[None])[0]) if t > 1 else []
        out = [self._VMAGIC, struct.pack("<H", t)]
        for i in range(t):
            s_intra = intra_streams[i]
            s_inter = inter_streams[i - 1] if i > 0 else None
            if s_inter is not None and len(s_inter) < len(s_intra):
                mode, stream = 1, s_inter
            else:
                mode, stream = 0, s_intra
            out.append(struct.pack("<BI", mode, len(stream)))
            out.append(stream)
        return b"".join(out)

    def decode_clip(self, data: bytes) -> np.ndarray:
        if data[:4] != self._VMAGIC:
            raise ValueError("not a deepcv video codec stream")
        (t,) = struct.unpack_from("<H", data, 4)
        pos = 6
        modes, streams = [], []
        for _ in range(t):
            mode, length = struct.unpack_from("<BI", data, pos)
            pos += 5
            streams.append(data[pos:pos + length])
            modes.append(mode)
            pos += length
        if modes and modes[0] != 0:
            raise ValueError("corrupt stream: first frame must be intra")
        # batch the per-model decodes (decode cost is phase-sequential, so
        # grouping same-model streams keeps one dispatch per phase)
        intra_idx = [i for i, m in enumerate(modes) if m == 0]
        inter_idx = [i for i, m in enumerate(modes) if m == 1]
        planes: Dict[int, np.ndarray] = {}
        if intra_idx:
            dec = self.intra.decode_batch([streams[i] for i in intra_idx])
            planes.update(zip(intra_idx, dec))
        if inter_idx:
            dec = self.inter.decode_batch([streams[i] for i in inter_idx])
            planes.update(zip(inter_idx, dec))
        frames = np.zeros((t,) + self.frame_shape, np.uint8)
        for i in range(t):
            if modes[i] == 0:
                frames[i] = planes[i]
            else:  # inter: previous DECODED frame + wrapped residual
                frames[i] = ((frames[i - 1].astype(np.int16)
                              + planes[i].astype(np.int16)) % 256
                             ).astype(np.uint8)
        return frames

    def evaluate(self, clips: np.ndarray, *, n_code: int = 2
                 ) -> Dict[str, float]:
        """Realized rate report over the first ``n_code`` clips: coded
        bits/subpixel, intra-only baseline, inter-mode share."""
        clips = np.asarray(clips, np.uint8)
        per_clip = int(np.prod(clips.shape[1:]))
        sizes, intra_sizes, inter_frames, total_frames = [], [], 0, 0
        for clip in clips[:n_code]:
            blob = self.encode_clip(clip)
            sizes.append(len(blob))
            intra_sizes.append(sum(len(s)
                                   for s in self.intra.encode_batch(clip)))
            (t,) = struct.unpack_from("<H", blob, 4)
            pos = 6
            for _ in range(t):
                mode, length = struct.unpack_from("<BI", blob, pos)
                inter_frames += int(mode == 1)
                total_frames += 1
                pos += 5 + length
        return {"coded_bits_per_dim": float(np.mean(sizes)) * 8 / per_clip,
                "intra_only_bits_per_dim":
                    float(np.mean(intra_sizes)) * 8 / per_clip,
                "inter_frame_share": inter_frames / max(1, total_frames)}


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
