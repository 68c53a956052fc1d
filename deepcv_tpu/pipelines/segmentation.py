"""Semantic segmentation: a WORKING HRNet-headed dense-prediction pipeline.

Reference parity++: the reference has NO segmentation pipeline, but its
HRNet block family (/root/reference/src/deepcv/meta/hrnet.py, docstrings
citing arXiv:1908.07919) exists precisely for dense prediction — this
module closes that loop the TPU way:

  * any spec-built backbone (the channel-consistent ``hrnet_backbone``
    from conf by default) + a 1x1 class conv + a bilinear ``interpolate``
    node back to input resolution — all appended by :func:`create_segmenter`
    so the YAML stays a pure backbone description;
  * :func:`segmentation_loss` — per-pixel softmax cross-entropy on integer
    masks (one fused log-softmax + gather, no one-hot materialization);
  * jit-safe eval metrics: pixel accuracy and mean-IoU over the classes
    present (confusion sums, no host round-trips);
  * a synthetic shapes dataset with per-pixel masks (dataset type
    'synthetic_shapes_seg'; no egress needed), sharing the detection
    pipeline's colored-rectangle generator family (detection.py:59-92).
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

__all__ = ["get_pipelines", "generate_segmentation_dataset",
           "segmentation_loss", "pixel_accuracy", "mean_iou",
           "create_segmenter", "train_segmenter"]

_logger = logging.getLogger(__name__)

#: class 0 is background; 1..3 are the rectangle colors
SEG_CLASSES = ("background", "red", "green", "blue")


def generate_segmentation_dataset(n: int = 512, image_size: int = 32,
                                  max_objects: int = 3, seed: int = 0,
                                  train: bool = True) -> ArrayDataset:
    """Images with 1..max_objects colored rectangles over dark noise;
    targets are per-pixel int32 masks (0 = background, 1+c = class).
    Later rectangles overwrite earlier ones — masks stay consistent with
    the rendered pixels by construction."""
    rng = np.random.default_rng(seed + (0 if train else 1))
    c = len(SEG_CLASSES) - 1
    imgs = np.zeros((n, image_size, image_size, 3), np.uint8)
    masks = np.zeros((n, image_size, image_size), np.int32)
    for i in range(n):
        imgs[i] = rng.integers(0, 40, (image_size, image_size, 3))
        for _ in range(int(rng.integers(1, max_objects + 1))):
            w = rng.uniform(0.15, 0.45)
            h = rng.uniform(0.15, 0.45)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            cls = int(rng.integers(c))
            x0, x1 = int((cx - w / 2) * image_size), int((cx + w / 2) * image_size)
            y0, y1 = int((cy - h / 2) * image_size), int((cy + h / 2) * image_size)
            color = np.zeros(3, np.uint8)
            color[cls] = rng.integers(180, 256)
            imgs[i, y0:y1, x0:x1] = color
            masks[i, y0:y1, x0:x1] = 1 + cls
    return ArrayDataset(imgs, masks, classes=list(SEG_CLASSES),
                        name=f"seg_shapes_{'train' if train else 'test'}",
                        provenance="synthetic")


_dataset_loader("synthetic_shapes_seg")(
    lambda root=None, train=True, n=512, image_size=32, seed=0, **kw:
    generate_segmentation_dataset(n=int(n), image_size=int(image_size),
                                  seed=int(seed), train=train))


# --------------------------------------------------------------------------- #
# Loss / metrics
# --------------------------------------------------------------------------- #

def segmentation_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel softmax cross-entropy. pred (N, H, W, C) logits,
    target (N, H, W) integer mask."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    return -jnp.mean(ll)


def pixel_accuracy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(pred, axis=-1) == target).astype(jnp.float32))


def mean_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean IoU over the classes present in (prediction ∪ ground truth) —
    the standard semantic-segmentation metric, as pure batched reductions
    (one one-hot einsum; static class count from the logits)."""
    num_classes = pred.shape[-1]
    cls = jnp.argmax(pred, axis=-1)
    p1 = jax.nn.one_hot(cls.reshape(-1), num_classes, dtype=jnp.float32)
    t1 = jax.nn.one_hot(target.reshape(-1).astype(jnp.int32), num_classes,
                        dtype=jnp.float32)
    inter = jnp.sum(p1 * t1, axis=0)
    union = jnp.sum(p1, axis=0) + jnp.sum(t1, axis=0) - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1)


# --------------------------------------------------------------------------- #
# Pipeline
# --------------------------------------------------------------------------- #

def create_segmenter(datasets, model_params: Mapping[str, Any]) -> DeepcvModule:
    """Backbone-from-YAML + appended 1x1 class conv (no act/norm) +
    bilinear upsample back to the input resolution — the YAML describes
    only the backbone; head sizing comes from the dataset's class list."""
    import copy
    trainset = datasets["trainset"]
    num_classes = len(trainset.dataset.classes or SEG_CLASSES)
    hp = copy.deepcopy(dict(model_params))
    append_dense_head(hp, "seg_head", num_classes, trainset.image_shape[:2])
    return DeepcvModule(trainset.image_shape, hp)


def train_segmenter(datasets, model: DeepcvModule, hp: Mapping[str, Any],
                    trackers=()):
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, segmentation_loss, datasets,
                              backend_conf=backend,
                              metrics={"pixel_accuracy": pixel_accuracy,
                                       "mean_iou": mean_iou},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


def get_pipelines() -> Dict[str, Pipeline]:
    train_pipeline = Pipeline([
        Node(preprocess, ["seg_train", "seg_test",
                          "params:seg_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_segmenter, ["datasets",
                                "params:semantic_segmentation_model"],
             "model", name="create_segmenter"),
        Node(train_segmenter, ["datasets", "model",
                               "params:train_semantic_segmentation",
                               "trackers"],
             "train_results", name="train"),
    ], name="train_semantic_segmentation", tags={"train", "segmentation"})
    return {"train_semantic_segmentation": train_pipeline}
