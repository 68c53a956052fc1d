"""Pose (keypoint-heatmap) pipeline tests — HRNet's canonical task; the
reference positions HRNet for pose but ships no such pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.pipelines.pose import (
    POSE_KEYPOINTS, create_pose_estimator, decode_heatmaps,
    generate_pose_dataset, heatmap_mse_loss, pck, train_pose_estimator,
)


@pytest.fixture(scope="module")
def pose_data():
    return generate_pose_dataset(n=64, image_size=16, heatmap_size=8, seed=0)


def test_generator_heatmaps_consistent(pose_data):
    assert pose_data.images.shape == (64, 16, 16, 3)
    assert pose_data.targets.shape == (64, 8, 8, len(POSE_KEYPOINTS))
    t = pose_data.targets
    # each channel is one unit-peak Gaussian
    assert np.allclose(t.reshape(64, -1, 4).max(axis=1), 1.0)
    # corners order: TL x < TR x, TL y < BL y (argmax positions)
    coords, scores = decode_heatmaps(jnp.asarray(t))
    c = np.asarray(coords)
    assert np.all(c[:, 0, 0] <= c[:, 1, 0] + 1e-6)   # TL.x <= TR.x
    assert np.all(c[:, 0, 1] <= c[:, 2, 1] + 1e-6)   # TL.y <= BL.y
    assert np.all(np.asarray(scores) > 0.9)


def test_decode_and_pck_semantics(pose_data):
    t = jnp.asarray(pose_data.targets[:8])
    # decoding the target against itself is a perfect prediction
    assert float(pck(t, t)) == 1.0
    assert float(heatmap_mse_loss(t, t)) == 0.0
    # a uniformly-zero prediction decodes somewhere fixed; PCK collapses
    zero = jnp.zeros_like(t)
    assert float(pck(zero, t)) < 0.5
    # quarter-pixel shift: a peak with a larger right neighbor moves +x;
    # the y lookup reads around the INTEGER peak (a left-shifted x must not
    # corrupt it) and ties leave y unshifted
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    hm[0, 4, 3, 0] = 0.6       # left neighbor bigger -> x shifts -0.25
    hm[0, 5, 4, 0] = 0.5       # below bigger -> y shifts +0.25
    hm[0, 3, 3, 0] = 0.55      # decoy at the SHIFTED x column
    coords, _ = decode_heatmaps(jnp.asarray(hm))
    assert abs(float(coords[0, 0, 0]) - 3.75) < 1e-6
    assert abs(float(coords[0, 0, 1]) - 4.25) < 1e-6
    # border peaks are not refined (coords never leave the grid)
    hm2 = np.zeros((1, 8, 8, 1), np.float32)
    hm2[0, 3, 0, 0] = 1.0
    hm2[0, 3, 1, 0] = 0.4
    c2, _ = decode_heatmaps(jnp.asarray(hm2))
    assert float(c2[0, 0, 0]) == 0.0
    # jit-safe
    assert np.isfinite(float(jax.jit(pck)(t, t)))


def test_pose_training_reaches_high_pck(tmp_path):
    raw = generate_pose_dataset(n=256, image_size=16, heatmap_size=8, seed=1)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.15},
                       "transforms": ["to_tensor"]})
    model = create_pose_estimator(data, {
        "act_fn": "relu",
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16,
                        "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 32,
                        "padding": 1}},
        ]})
    assert model.eval_output_shape() == (1, 8, 8, len(POSE_KEYPOINTS))
    hp = {"epochs": 10, "batch_size": 32, "optimizer": "adamw",
          "optimizer_opts": {"lr": 3e-3}, "save_every_iters": 0,
          "output_path": str(tmp_path), "seed": 0,
          "validate_every_epochs": 2, "log_progress_every_iters": 1,
          "backend_conf": {"n_devices": 1}}
    out = train_pose_estimator(data, model, hp)
    h = out["history"]
    assert h["train"][-1]["main_loss"] < h["train"][0]["main_loss"]
    assert h["valid"][-1]["valid_pck"] > 0.9   # measured: 1.0 by epoch 6


def test_pipeline_registered():
    from deepcv_tpu.pipelines.registry import create_pipelines
    ps = create_pipelines()
    assert "train_pose_estimator" in ps
    names = [n.name for n in ps["train_pose_estimator"].nodes]
    assert names == ["preprocess", "create_pose_estimator", "train"]
