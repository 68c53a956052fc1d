"""Pose estimation: keypoint HEATMAP regression (HRNet's canonical task).

Reference parity++: the reference positions its HRNet blocks for pose
(hrnet.py docstrings cite arXiv:1908.07919, whose headline benchmark is
COCO keypoints) but ships no pose pipeline; this module closes that loop:

  * any spec-built backbone + a 1x1 conv to K heatmap channels + bilinear
    resize to the dataset's heatmap resolution (appended by
    :func:`create_pose_estimator` — the YAML stays a backbone description);
  * targets are per-keypoint Gaussian heatmaps (the standard top-down pose
    encoding — SimpleBaselines/HRNet); loss is plain MSE over heatmaps;
  * :func:`decode_heatmaps` — argmax + quarter-pixel offset toward the
    neighboring mass (the classic subpixel refinement), jit-safe;
  * PCK@alpha metric (fraction of keypoints within alpha * heatmap size of
    the ground truth), computed fully on device;
  * a synthetic dataset of bright rectangles whose 4 corners are the
    keypoints (no egress needed; dataset type 'synthetic_pose').
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from deepcv_tpu.pipelines.framework import Node, Pipeline, \
    append_dense_head, preprocess_node as preprocess
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import ArrayDataset, _dataset_loader
from deepcv_tpu.train import train as train_fn
from deepcv_tpu.train.backend import BackendConfig

__all__ = ["get_pipelines", "generate_pose_dataset", "heatmap_mse_loss",
           "pck", "decode_heatmaps", "create_pose_estimator",
           "train_pose_estimator", "POSE_KEYPOINTS"]

_logger = logging.getLogger(__name__)

#: the synthetic task's keypoint names (rectangle corners)
POSE_KEYPOINTS = ("top_left", "top_right", "bottom_left", "bottom_right")


def generate_pose_dataset(n: int = 512, image_size: int = 32,
                          heatmap_size: int = 16, sigma: float = 1.0,
                          seed: int = 0, train: bool = True) -> ArrayDataset:
    """One bright rectangle per image over dark noise; keypoints = its 4
    corners. Targets are (heatmap, heatmap, K) Gaussian maps peaked at each
    corner (peak exactly on the nearest heatmap cell, so argmax decoding of
    the TARGET recovers the ground truth)."""
    rng = np.random.default_rng(seed + (0 if train else 1))
    k = len(POSE_KEYPOINTS)
    s = heatmap_size
    imgs = np.zeros((n, image_size, image_size, 3), np.uint8)
    tgts = np.zeros((n, s, s, k), np.float32)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    for i in range(n):
        imgs[i] = rng.integers(0, 40, (image_size, image_size, 3))
        w = rng.uniform(0.3, 0.7)
        h = rng.uniform(0.3, 0.7)
        cx = rng.uniform(w / 2, 1 - w / 2)
        cy = rng.uniform(h / 2, 1 - h / 2)
        x0, x1 = (cx - w / 2) * image_size, (cx + w / 2) * image_size
        y0, y1 = (cy - h / 2) * image_size, (cy + h / 2) * image_size
        color = rng.integers(150, 256, 3)
        imgs[i, int(y0):int(y1), int(x0):int(x1)] = color
        corners = [(x0, y0), (x1 - 1, y0), (x0, y1 - 1), (x1 - 1, y1 - 1)]
        for j, (px, py) in enumerate(corners):
            hx = min(s - 1, round(px / image_size * s))
            hy = min(s - 1, round(py / image_size * s))
            tgts[i, :, :, j] = np.exp(-((xx - hx) ** 2 + (yy - hy) ** 2)
                                      / (2.0 * sigma ** 2))
    return ArrayDataset(imgs, tgts, classes=list(POSE_KEYPOINTS),
                        name=f"pose_{'train' if train else 'test'}",
                        provenance="synthetic")


_dataset_loader("synthetic_pose")(
    lambda root=None, train=True, n=512, image_size=32, heatmap_size=16,
    sigma=1.0, seed=0, **kw:
    generate_pose_dataset(n=int(n), image_size=int(image_size),
                          heatmap_size=int(heatmap_size),
                          sigma=float(sigma), seed=int(seed), train=train))


# --------------------------------------------------------------------------- #
# Loss / decode / metric
# --------------------------------------------------------------------------- #

def heatmap_mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean-squared error over heatmaps (the standard pose loss —
    SimpleBaselines eq. 1). pred/target: (N, S, S, K)."""
    return jnp.mean((pred.astype(jnp.float32)
                     - target.astype(jnp.float32)) ** 2)


def decode_heatmaps(pred: jnp.ndarray):
    """Heatmaps -> keypoint coords: per-channel argmax with the classic
    quarter-pixel shift toward the larger neighbor on each axis (HRNet
    post-processing). Both neighbor lookups read around the INTEGER peak
    (an earlier draft shifted x first, corrupting the y lookup), and —
    like HRNet's reference code — only interior peaks (0 < p < s-1 per
    axis) are refined, so coordinates never leave the grid. Returns
    (coords (N, K, 2) in (x, y) heatmap pixels, scores (N, K) = peak
    value). jit-safe (static shapes)."""
    n, s, _, k = pred.shape
    flat = pred.reshape(n, s * s, k)
    idx = jnp.argmax(flat, axis=1)                       # (N, K)
    scores = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0, :]
    yi = (idx // s).astype(jnp.int32)
    xi = (idx % s).astype(jnp.int32)

    def at(dx, dy):
        xj = jnp.clip(xi + dx, 0, s - 1)
        yj = jnp.clip(yi + dy, 0, s - 1)
        return jnp.take_along_axis(flat, (yj * s + xj)[:, None, :],
                                   axis=1)[:, 0, :]

    x = xi.astype(jnp.float32)
    y = yi.astype(jnp.float32)
    x_interior = (xi > 0) & (xi < s - 1)
    y_interior = (yi > 0) & (yi < s - 1)
    x = x + jnp.where(x_interior,
                      0.25 * jnp.sign(at(1, 0) - at(-1, 0)), 0.0)
    y = y + jnp.where(y_interior,
                      0.25 * jnp.sign(at(0, 1) - at(0, -1)), 0.0)
    return jnp.stack([x, y], axis=-1), scores


def pck(pred: jnp.ndarray, target: jnp.ndarray,
        alpha: float = 0.1) -> jnp.ndarray:
    """PCK@alpha: fraction of keypoints whose decoded location lies within
    ``alpha * heatmap_size`` pixels of the target's peak."""
    s = pred.shape[1]
    pc, _ = decode_heatmaps(pred)
    tc, _ = decode_heatmaps(target)
    dist = jnp.linalg.norm(pc - tc, axis=-1)             # (N, K)
    return jnp.mean((dist <= alpha * s).astype(jnp.float32))


# --------------------------------------------------------------------------- #
# Pipeline
# --------------------------------------------------------------------------- #

def create_pose_estimator(datasets, model_params: Mapping[str, Any]
                          ) -> DeepcvModule:
    """Backbone-from-YAML + appended 1x1 heatmap conv (no act/norm) +
    bilinear resize to the dataset's heatmap resolution; K comes from the
    dataset's keypoint list."""
    import copy
    trainset = datasets["trainset"]
    tgt = trainset.dataset.targets
    s, k = tgt.shape[1], tgt.shape[-1]
    hp = copy.deepcopy(dict(model_params))
    append_dense_head(hp, "pose_head", k, (s, s))
    return DeepcvModule(trainset.image_shape, hp)


def train_pose_estimator(datasets, model: DeepcvModule,
                         hp: Mapping[str, Any], trackers=()):
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, heatmap_mse_loss, datasets,
                              backend_conf=backend,
                              metrics={"pck": pck},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


def get_pipelines() -> Dict[str, Pipeline]:
    train_pipeline = Pipeline([
        Node(preprocess, ["pose_train", "pose_test",
                          "params:pose_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_pose_estimator, ["datasets",
                                     "params:pose_estimator_model"],
             "model", name="create_pose_estimator"),
        Node(train_pose_estimator, ["datasets", "model",
                                    "params:train_pose_estimator",
                                    "trackers"],
             "train_results", name="train"),
    ], name="train_pose_estimator", tags={"train", "pose"})
    return {"train_pose_estimator": train_pipeline}
