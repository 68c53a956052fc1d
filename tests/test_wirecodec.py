"""Wire codec (data/wirecodec.py): lossless roundtrip through the on-device
decoder, raw fallback on incompressible data, and the streaming-train
integration (r4 verdict #6). Reference analogue: the prefetch pipeline the
streaming path replaces, datasets.py:76-115."""
import numpy as np
import pytest

from deepcv_tpu.data.wirecodec import (decode_u8, device_decode, encode_u8,
                                       wire_bytes)


def _walk(b=8, h=16, w=16, c=3, step=3, seed=0):
    rng = np.random.default_rng(seed)
    steps = rng.integers(-step, step + 1, (b, h * w, c)).astype(np.int16)
    walk = np.cumsum(steps, axis=1) + rng.integers(0, 256, (b, 1, c))
    return np.abs(walk % 510 - 255).astype(np.uint8).reshape(b, h, w, c)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_roundtrip_smooth_walk(bits):
    x = _walk()
    p = encode_u8(x.reshape(8, -1, 3), bits=bits, axis=1)
    if p is None:            # bits=2 may not beat raw on +-3 steps
        assert bits == 2
        return
    y = np.asarray(device_decode(p)).reshape(x.shape)
    np.testing.assert_array_equal(y, x)
    assert wire_bytes(p) < x.nbytes


def test_bits3_beats_2x_on_smooth_data():
    x = _walk(b=16)
    p = encode_u8(x.reshape(16, -1, 3), bits=3, axis=1)
    assert p is not None
    assert x.nbytes / wire_bytes(p) > 2.0


def test_incompressible_falls_back_to_raw():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (8, 16, 16, 3), np.uint8)
    assert encode_u8(x, bits=4) is None


@pytest.mark.parametrize("arr", [
    np.zeros((2, 8, 8, 3), np.uint8),
    np.full((2, 8, 8, 3), 255, np.uint8),
    np.tile(np.arange(256, dtype=np.uint8), 6).reshape(1, 2, 768, 1),
])
def test_roundtrip_edge_patterns(arr):
    for bits in (2, 3, 4):
        p = encode_u8(arr, bits=bits, axis=-2)
        if p is None:
            continue
        np.testing.assert_array_equal(np.asarray(device_decode(p)), arr)


def test_escape_ordering_is_positional():
    """The i-th escape position must take the i-th overflow byte — a
    deliberate mix of escaping and fitting deltas."""
    x = np.array([[0, 1, 2, 130, 131, 3, 200, 201]], np.uint8)
    p = encode_u8(x, bits=2, axis=1)
    if p is not None:
        np.testing.assert_array_equal(np.asarray(device_decode(p)), x)
    # force-check via the pure decoder with bits=3 (escape=7)
    p3 = encode_u8(np.tile(x, (1, 32)), bits=3, axis=1)
    assert p3 is not None
    y = np.asarray(device_decode(p3))
    np.testing.assert_array_equal(y, np.tile(x, (1, 32)))


def test_streaming_train_with_wire_compression(tmp_path):
    """End-to-end: train() streaming path with wire_compression on matches
    the raw path's loss trajectory exactly (the codec is lossless, so the
    batches the model sees are bit-identical)."""
    from deepcv_tpu.data.datasets import ArrayDataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train import train

    x = _walk(b=128, h=8, w=8, c=3)
    yl = (np.arange(128) % 4).astype(np.int32)
    raw = ArrayDataset(images=x, targets=yl, name="walk", provenance="synthetic")
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.1},
                       "transforms": ["to_tensor"]})
    hp = {"epochs": 2, "batch_size": 32, "optimizer_opts": {"lr": 1e-2},
          "save_every_iters": 0, "log_progress_every_iters": 4,
          "validate_every_epochs": 1000, "seed": 0,
          "output_path": str(tmp_path),
          "handle_preemption": False, "device_resident_dataset": False,
          "native_loader": False}
    mhp = {"act_fn": "relu", "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 8, "padding": 1}},
        {"flatten": {}},
        {"fully_connected": {"out_features": 4, "act_fn": None,
                             "batch_norm": None}}]}

    def run(wire):
        m = DeepcvModule((8, 8, 3), mhp)
        _, h = train({**hp, "wire_compression": wire}, m, "cross_entropy",
                     data)
        return [e["cross_entropy"] for e in h["train"]]

    ls_raw = run(False)
    ls_codec = run({"bits": 3, "axis": -2})
    np.testing.assert_allclose(ls_raw, ls_codec, rtol=1e-6)
