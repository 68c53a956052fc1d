"""Video IO / conversion / distributed frame processing — reference
README.md:162-166 video-tooling TODOs (never started there): Y4M
interchange, memmap conversion, learned-codec container, mesh-sharded
frame mapping."""
import numpy as np
import pytest

from deepcv_tpu.data.video_io import (Y4MMeta, iter_dvv, iter_y4m,
                                      process_video, read_dvv, read_y4m,
                                      rgb_to_ycbcr, write_dvv, write_y4m,
                                      y4m_to_memmap, ycbcr_to_rgb)


def _frames(t=6, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (1, h, w, 3), np.uint8).astype(np.int16)
    drift = (np.arange(t, dtype=np.int16) * 7)[:, None, None, None]
    return ((base + drift) % 256).astype(np.uint8)


def test_ycbcr_roundtrip_tolerance():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (64, 64, 3), np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.max() <= 3          # studio-swing u8 quantization bound
    assert err.mean() < 1.0
    # BT.601 anchors: black/white map to Y=16/235, neutral chroma
    anchors = rgb_to_ycbcr(np.array([[0, 0, 0], [255, 255, 255]], np.uint8))
    np.testing.assert_array_equal(anchors, [[16, 128, 128], [235, 128, 128]])


@pytest.mark.parametrize("chroma", ["444", "420jpeg"])
def test_y4m_roundtrip(tmp_path, chroma):
    frames = _frames()
    path = tmp_path / f"clip_{chroma}.y4m"
    meta = write_y4m(path, frames, fps=(30, 1), chroma=chroma)
    assert meta == Y4MMeta(width=20, height=16, fps=(30, 1), chroma=chroma)
    back, meta2 = read_y4m(path)
    assert meta2 == meta
    assert back.shape == frames.shape
    if chroma == "444":            # full chroma: u8-quantization bound
        assert np.abs(back.astype(int) - frames.astype(int)).max() <= 3
    # the STORED luma plane is bit-exact in both modes (chroma detail of
    # NOISE frames is destroyed by 4:2:0 subsampling BY DESIGN, and
    # recomputing luma from clipped out-of-gamut RGB shifts it — so check
    # the plane in the file; the smooth-content test below bounds the
    # photographic RGB roundtrip)
    with open(path, "rb") as f:
        f.readline()
        f.readline()                                 # first FRAME marker
        y_plane = np.frombuffer(f.read(16 * 20), np.uint8).reshape(16, 20)
    np.testing.assert_array_equal(y_plane, rgb_to_ycbcr(frames[0])[..., 0])


def test_y4m_smooth_image_is_tight_even_420(tmp_path):
    """On chroma-smooth content (the photographic case) 4:2:0 is tight."""
    yy, xx = np.mgrid[0:32, 0:32]
    grad = np.stack([yy * 4, xx * 4, (yy + xx) * 2], -1).astype(np.uint8)
    path = tmp_path / "smooth.y4m"
    write_y4m(path, grad[None], chroma="420jpeg")
    back, _ = read_y4m(path)
    assert np.abs(back[0].astype(int) - grad.astype(int)).max() <= 8


def test_y4m_streaming_iter_matches_bulk_and_header_is_canonical(tmp_path):
    frames = _frames(t=5)
    path = tmp_path / "s.y4m"
    write_y4m(path, iter(list(frames)), fps=(24, 1), chroma="444")
    head = open(path, "rb").readline()
    assert head == b"YUV4MPEG2 W20 H16 F24:1 Ip A1:1 C444\n"
    meta, gen = iter_y4m(path)
    streamed = np.stack(list(gen))
    bulk, _ = read_y4m(path)
    np.testing.assert_array_equal(streamed, bulk)
    limited, _ = read_y4m(path, limit=2)
    np.testing.assert_array_equal(limited, bulk[:2])


def test_y4m_validation(tmp_path):
    p = tmp_path / "bad.y4m"
    p.write_bytes(b"NOTY4M W2 H2\n")
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        read_y4m(p)
    p.write_bytes(b"YUV4MPEG2 W4 H4 F25:1 Ip C444\nFRAME\n" + b"\x00" * 10)
    with pytest.raises(ValueError, match="truncated"):
        read_y4m(p)
    p.write_bytes(b"YUV4MPEG2 W4 H4 C410\n")
    with pytest.raises(ValueError, match="unsupported Y4M chroma"):
        read_y4m(p)
    with pytest.raises(ValueError, match="interlaced"):
        read_y4m_bytes = tmp_path / "i.y4m"
        read_y4m_bytes.write_bytes(b"YUV4MPEG2 W4 H4 It C444\n")
        read_y4m(read_y4m_bytes)
    with pytest.raises(ValueError, match="even dimensions"):
        write_y4m(tmp_path / "odd.y4m", np.zeros((1, 5, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="no frames"):
        write_y4m(tmp_path / "e.y4m", [])


def test_y4m_incompatible_variants_rejected_supported_sitings_read(tmp_path):
    """Exact chroma-tag matching: 10-bit / alpha variants are refused up
    front (prefix matching would misparse their frames as 8-bit 3-plane),
    while all 8-bit 4:2:0 sitings read (centered-siting approximation)."""
    p = tmp_path / "v.y4m"
    for tag in ("420p10", "444p16", "444alpha", "422"):
        p.write_bytes(f"YUV4MPEG2 W4 H4 F25:1 Ip C{tag}\n".encode())
        with pytest.raises(ValueError, match="unsupported Y4M chroma"):
            read_y4m(p)
    frame = bytes(range(16)) + bytes(4) + bytes(4)       # 4x4 Y + 2x2 Cb/Cr
    for tag in ("420", "420jpeg", "420mpeg2", "420paldv"):
        p.write_bytes(f"YUV4MPEG2 W4 H4 F25:1 Ip C{tag}\nFRAME\n".encode()
                      + frame)
        frames, meta = read_y4m(p)
        assert frames.shape == (1, 4, 4, 3) and meta.chroma == tag
    # writing only emits the sitings we actually produce
    with pytest.raises(ValueError, match="C444 or C420jpeg"):
        write_y4m(tmp_path / "w.y4m", np.zeros((1, 4, 4, 3), np.uint8),
                  chroma="420mpeg2")
    with pytest.raises(ValueError, match="limit must be >= 1"):
        read_y4m(p, limit=0)


def test_smooth_even_window_rejected():
    from deepcv_tpu.pipelines.classical_features import harris_response
    with pytest.raises(ValueError, match="must be odd"):
        harris_response(np.zeros((8, 8), np.float32), window=4)


def test_y4m_to_memmap_streaming_conversion(tmp_path):
    frames = _frames(t=7, h=16, w=16)
    src = tmp_path / "v.y4m"
    write_y4m(src, frames, chroma="444")
    mm = y4m_to_memmap(src, tmp_path / "v.npy")
    assert mm.shape == frames.shape and mm.dtype == np.uint8
    # the memmap IS a standard .npy: plain np.load sees the same data
    loaded = np.load(tmp_path / "v.npy", mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(loaded), np.asarray(mm))
    err = np.abs(np.asarray(mm).astype(int) - frames.astype(int))
    assert err.max() <= 3


def test_dvv_container_roundtrip_and_validation(tmp_path):
    from deepcv_tpu.codec import LosslessVideoCodec
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:16, 0:16]
    base = ((yy * 5 + xx * 3)[None, None, ..., None]
            + rng.normal(0, 2, (4, 3, 16, 16, 3)))
    clips = (base % 200 + 20).clip(0, 255).astype(np.uint8)
    codec = LosslessVideoCodec((16, 16, 3), n_scales=2, hidden=8, seed=0)
    codec.fit(clips, steps=30, batch_size=8, seed=1)

    path = tmp_path / "clips.dvv"
    assert write_dvv(path, clips, codec) == 4
    back = read_dvv(path, codec)
    np.testing.assert_array_equal(back, clips)          # LOSSLESS
    # streaming read yields clip by clip
    for got, want in zip(iter_dvv(path, codec), clips):
        np.testing.assert_array_equal(got, want)
    # container/codec shape mismatch is rejected up front
    other = LosslessVideoCodec((32, 32, 3), n_scales=2, hidden=8)
    with pytest.raises(ValueError, match="container is"):
        next(iter_dvv(path, other))
    bad = tmp_path / "bad.dvv"
    bad.write_bytes(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError, match="not a deepcv video container"):
        next(iter_dvv(bad, codec))
    # truncated containers raise the module's ValueError (never struct
    # errors or short reads handed to the range coder)
    whole = path.read_bytes()
    cut_in_len = tmp_path / "cut1.dvv"
    first_clip_end = 10 + 4 + int.from_bytes(whole[10:14], "little")
    cut_in_len.write_bytes(whole[:first_clip_end + 2])   # 2 of 4 len bytes
    with pytest.raises(ValueError, match="length prefix"):
        list(iter_dvv(cut_in_len, codec))
    cut_in_clip = tmp_path / "cut2.dvv"
    cut_in_clip.write_bytes(whole[:first_clip_end + 40])
    with pytest.raises(ValueError, match="truncated .dvv"):
        list(iter_dvv(cut_in_clip, codec))


def test_predict_cli_accepts_y4m(tmp_path):
    """`predict --input video.y4m`: image pipeline application to a video
    file through the serving CLI (reference 'image pipeline application'
    video-tooling bullet)."""
    import jax
    from deepcv_tpu.cli import main
    from deepcv_tpu.serve import save_model_bundle
    from deepcv_tpu.spec import DeepcvModule

    hp = {"act_fn": "relu",
          "architecture": [
              {"avg_pooling": {"kernel_size": [4, 4], "stride": [4, 4]}},
              {"flatten": {}},
              {"fully_connected": {"out_features": 5}}]}
    model = DeepcvModule((16, 16, 3), hp)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0)))
    bundle = save_model_bundle(tmp_path / "bundle", model, variables)

    frames = _frames(t=9, h=16, w=16)
    write_y4m(tmp_path / "in.y4m", frames, chroma="444")
    out = tmp_path / "preds.npy"
    rc = main(["predict", "--bundle", str(bundle),
               "--input", str(tmp_path / "in.y4m"),
               "--output", str(out), "--batch-size", "4", "--to-tensor"])
    assert rc == 0
    preds = np.load(out)
    assert preds.shape == (9, 5)


def test_process_video_mesh_sharded_matches_direct():
    import jax
    import jax.numpy as jnp
    from deepcv_tpu.parallel import make_mesh

    frames = _frames(t=21, h=8, w=8)            # 21 = ragged tail vs 8
    fn = jax.jit(lambda x: (x.astype(jnp.float32) / 255.0).mean((1, 2)))
    mesh = make_mesh({"data": 8})
    out = process_video(frames, fn, batch_size=8, mesh=mesh)
    direct = np.asarray(fn(frames))
    np.testing.assert_allclose(out, direct, rtol=1e-6)
    assert out.shape == (21, 3)

    # iterator input (the iter_y4m shape) and host preprocess compose
    out2 = process_video(iter(list(frames)), fn, batch_size=8, mesh=mesh,
                         preprocess=lambda b: b.copy())
    np.testing.assert_allclose(out2, direct, rtol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        process_video(frames, fn, batch_size=6, mesh=mesh)
    with pytest.raises(ValueError, match="no frames"):
        process_video(iter([]), fn, batch_size=8)
