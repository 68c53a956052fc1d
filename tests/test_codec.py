"""Learned lossless codec (reference README.md:157-161 — a pure TODO there).
Covers the range coder (roundtrip, C++/Python stream identity, near-entropy
rate), CDF quantization invariants, and the full codec: training lowers the
rate, encode/decode is bit-exact on unseen images, realized bytes track the
model's rate."""
import numpy as np
import pytest

from deepcv_tpu.codec import LosslessCodec, quantize_cdf
from deepcv_tpu.runtime.range_coder import (TOTAL, rc_decode, rc_encode,
                                            rc_native_available)


def _random_cdfs(rng, n, k, concentration=0.3):
    probs = rng.dirichlet(np.full(k, concentration), size=n)
    return probs, quantize_cdf(probs)


def test_quantize_cdf_invariants():
    rng = np.random.default_rng(0)
    probs, cdf = _random_cdfs(rng, 100, 256)
    assert cdf.dtype == np.uint32 and cdf.shape == (100, 257)
    assert (cdf[:, 0] == 0).all() and (cdf[:, -1] == TOTAL).all()
    freqs = np.diff(cdf.astype(np.int64), axis=1)
    assert freqs.min() >= 1                      # zero mass is uncodable
    # frequencies track the input distribution
    big = probs.argmax(axis=1)
    assert (freqs[np.arange(100), big] >= freqs.mean(axis=1)).all()


@pytest.mark.parametrize("k", [2, 256])
def test_range_coder_roundtrip_and_rate(k):
    rng = np.random.default_rng(1)
    n = 3000
    probs, cdf = _random_cdfs(rng, n, k)
    syms = np.array([rng.choice(k, p=probs[i]) for i in range(n)], np.uint16)
    blob = rc_encode(syms, cdf)
    assert (rc_decode(blob, n, cdf) == syms).all()
    # realized bytes within 16 B of the quantized model's entropy
    f = cdf[np.arange(n), syms + 1] - cdf[np.arange(n), syms]
    ideal = -np.log2(f / TOTAL).sum() / 8
    assert len(blob) <= ideal + 16
    # skewed streams must actually compress
    if k == 256:
        assert len(blob) < 2 * n                  # << 2 bytes/symbol


def test_range_coder_python_mirror_is_bit_identical():
    if not rc_native_available():
        pytest.skip("native coder not built")
    rng = np.random.default_rng(2)
    probs, cdf = _random_cdfs(rng, 500, 16)
    syms = np.array([rng.choice(16, p=probs[i]) for i in range(500)], np.uint16)
    native = rc_encode(syms, cdf)
    mirror = rc_encode(syms, cdf, force_python=True)
    assert native == mirror
    assert (rc_decode(native, 500, cdf, force_python=True) == syms).all()


def test_range_coder_empty():
    cdf = quantize_cdf(np.full((1, 4), 0.25))
    assert rc_decode(rc_encode(np.empty(0, np.uint16), cdf[:0]), 0, cdf[:0]).size == 0


def _smooth_images(n, size=16, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    base = (yy[None] * rng.integers(2, 8, (n, 1, 1))
            + xx[None] * rng.integers(2, 8, (n, 1, 1)))
    img = (base[..., None] % 64 + 96 + rng.normal(0, 3, (n, size, size, 3)))
    return img.clip(0, 255).astype(np.uint8)


@pytest.mark.slow
def test_codec_learns_exact_roundtrip_and_rate(tmp_path):
    train, test = _smooth_images(64, seed=3), _smooth_images(6, seed=4)
    codec = LosslessCodec((16, 16, 3), n_scales=2, hidden=16, seed=0)
    bpd0 = codec.bits_per_dim(test)
    hist = codec.fit(train, steps=180, batch_size=16, lr=3e-3, seed=1)
    bpd1 = codec.bits_per_dim(test)
    assert hist[-1] < hist[0] and bpd1 < bpd0 - 1.5   # trained, generalizes
    assert bpd1 < 6.0                                  # well under raw 8 bpd

    for img in test[:3]:                               # LOSSLESS, unseen data
        blob = codec.encode(img)
        assert (codec.decode(blob) == img).all()
        assert len(blob) < img.size                    # beats raw bytes

    # bitstreams are BATCH-SIZE INVARIANT (the probability model always
    # runs at the fixed internal coding batch, so encode(img) == the same
    # image's stream from any encode_batch and decodes at any batch size)
    batched = codec.encode_batch(test[:3])
    assert [codec.encode(img) for img in test[:3]] == batched
    assert (codec.decode_batch(batched) == test[:3]).all()

    report = codec.evaluate(test, n_code=3)
    # realized rate = model rate + raw top level (1/16 of pixels at 8 bpd)
    # + ~12 B/image block overhead
    assert report["coded_bits_per_dim"] == pytest.approx(
        report["bits_per_dim"], abs=1.0)
    assert report["coded_bits_per_dim"] < 8.0


def test_codec_progressive_and_partial_decode():
    """Progressive loading (reference README.md:159 'keep in mind the
    possibility of progressive image/frame loading/streaming'): the
    coarse->fine bitstream renders previews from byte PREFIXES, and a
    truncated stream decodes to the finest fully-contained level."""
    train, test = _smooth_images(32, seed=5), _smooth_images(2, seed=6)
    codec = LosslessCodec((16, 16, 3), n_scales=2, hidden=8, seed=0)
    codec.fit(train, steps=40, batch_size=16, seed=1)
    img = test[0]
    blob = codec.encode(img)

    outs = list(codec.decode_progressive(blob))
    assert [o["level"] for o in outs] == [2, 1, 0]
    assert [o["final"] for o in outs] == [False, False, True]
    consumed = [o["bytes_consumed"] for o in outs]
    assert consumed == sorted(consumed) and consumed[-1] == len(blob)
    for o in outs:                        # previews are always full-res
        assert o["image"].shape == img.shape
    assert (outs[-1]["image"] == img).all()          # last yield is exact
    # the coarsest preview is the nearest-upsampled raw top level
    assert (outs[0]["image"][::4, ::4] == img[::4, ::4]).all()
    # previews sharpen monotonically (mean abs error to the truth shrinks)
    errs = [np.abs(o["image"].astype(int) - img.astype(int)).mean()
            for o in outs]
    assert errs[0] > errs[1] > errs[2] == 0.0

    # partial decode: any prefix renders at its finest complete level
    full, lvl = codec.decode_partial(blob)
    assert lvl == 0 and (full == img).all()
    mid, lvl_mid = codec.decode_partial(blob[:consumed[1] + 2])
    assert lvl_mid == 1 and (mid == outs[1]["image"]).all()
    coarse, lvl_top = codec.decode_partial(blob[:consumed[0]])
    assert lvl_top == 2 and (coarse == outs[0]["image"]).all()
    # cutting INSIDE a level falls back to the previous complete one
    inside, lvl_in = codec.decode_partial(blob[:consumed[1] - 1])
    assert lvl_in == 2
    with pytest.raises(ValueError, match="truncated"):
        codec.decode_partial(blob[:10])


def test_codec_rejects_bad_inputs():
    codec = LosslessCodec((16, 16, 3), n_scales=2, hidden=8)
    with pytest.raises(ValueError, match="expected"):
        codec.encode(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="not a deepcv codec stream"):
        codec.decode(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError, match="divisible"):
        LosslessCodec((10, 10, 3), n_scales=2)
    other = LosslessCodec((32, 32, 3), n_scales=2, hidden=8)
    with pytest.raises(ValueError, match="stream is"):
        other.decode(codec.encode(np.zeros((16, 16, 3), np.uint8)))


# --------------------------------------------------------------------------- #
# Video codec (intra/inter over two pyramid models)
# --------------------------------------------------------------------------- #

def _toy_clips(n=6, t=5, s=16, seed=0):
    """Static noisy background + a moving bright block: temporally
    correlated, so inter residuals are sparse."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 80, (n, 1, s, s, 3), np.uint8)
    clips = np.repeat(bg, t, axis=1).copy()
    for i in range(n):
        y, x = rng.integers(0, s - 4, 2)
        for f in range(t):
            clips[i, f, (y + f) % (s - 3):(y + f) % (s - 3) + 3,
                  x:x + 3] = 220
    return clips


def test_video_codec_exact_roundtrip():
    from deepcv_tpu.codec import LosslessVideoCodec
    clips = _toy_clips()
    vc = LosslessVideoCodec((16, 16, 3), n_scales=2, hidden=8, seed=0,
                            coding_batch=4)
    vc.fit(clips[:5], steps=40, batch_size=8, lr=3e-3, seed=0)
    blob = vc.encode_clip(clips[5])
    out = vc.decode_clip(blob)
    assert out.dtype == np.uint8 and out.shape == clips[5].shape
    np.testing.assert_array_equal(out, clips[5])


def test_video_codec_inter_beats_intra_on_correlated_video():
    from deepcv_tpu.codec import LosslessVideoCodec
    clips = _toy_clips()
    vc = LosslessVideoCodec((16, 16, 3), n_scales=2, hidden=8, seed=0,
                            coding_batch=4)
    vc.fit(clips[:5], steps=60, batch_size=8, lr=3e-3, seed=0)
    report = vc.evaluate(clips[5:], n_code=1)
    # correlated video: residual coding must undercut intra-only, and the
    # encoder must actually be CHOOSING inter for most non-key frames
    assert report["coded_bits_per_dim"] < report["intra_only_bits_per_dim"]
    assert report["inter_frame_share"] >= 0.5, report


def test_video_codec_mode_flags_and_validation():
    from deepcv_tpu.codec import LosslessVideoCodec
    import struct as _struct
    clips = _toy_clips(n=2, t=3)
    vc = LosslessVideoCodec((16, 16, 3), n_scales=2, hidden=8, seed=0,
                            coding_batch=2)
    vc.fit(clips, steps=20, batch_size=4, lr=3e-3, seed=0)
    blob = vc.encode_clip(clips[0])
    assert blob[:4] == b"DCVV"
    mode0, _ = _struct.unpack_from("<BI", blob, 6)
    assert mode0 == 0                       # first frame is always intra
    with pytest.raises(ValueError, match="clip"):
        vc.encode_clip(clips[0, 0])         # a frame, not a clip
    with pytest.raises(ValueError, match="video codec stream"):
        vc.decode_clip(b"XXXX" + blob[4:])
