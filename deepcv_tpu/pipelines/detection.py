"""Object detection: a WORKING single-stage dense detector pipeline.

Reference parity++: /root/reference/src/deepcv/detection/detector.py is a
stub (``get_pipelines() -> {}``, :29-30, with single-stage/YOLO-like intent
sketched in comments). This module implements that intent end-to-end,
TPU-style:

  * a dense grid head over backbone features: every SxS cell predicts
    (objectness, cx, cy, w, h, class logits) — one conv, no anchors, static
    shapes throughout (cell-matched YOLOv1-style assignment);
  * :func:`detection_loss` — BCE objectness + MSE box (object cells) +
    CE class (object cells), one fused jnp expression;
  * :func:`decode_detections` — top-k confident boxes, jit-safe;
  * a synthetic-shapes dataset generator (colored rectangles; no egress
    needed) registered as dataset type 'synthetic_shapes';
  * pipeline ``train_object_detector`` wired through the standard runtime.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as fnn

from deepcv_tpu.pipelines.framework import Node, Pipeline, \
    preprocess_node as preprocess
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import ArrayDataset, _dataset_loader
from deepcv_tpu.train import train as train_fn
from deepcv_tpu.train.backend import BackendConfig

__all__ = ["get_pipelines", "DenseDetectionHead", "detection_loss",
           "decode_detections", "map50", "create_detector", "train_detector",
           "generate_shapes_dataset", "detection_loss_focal",
           "decode_detections_flat", "map50_flat", "flat_grid_layout",
           "generate_shapes_dataset_fpn", "create_fpn_detector",
           "train_fpn_detector"]

_logger = logging.getLogger(__name__)

#: synthetic-shapes classes (also the rectangle fill colors)
SHAPE_CLASSES = ("red", "green", "blue")


class DenseDetectionHead(fnn.Module):
    """Per-cell (objectness + box + class) prediction head over a feature map.
    Output: (N, S, S, 5 + num_classes)."""
    num_classes: int

    @fnn.compact
    def __call__(self, features, *, train: bool = False):
        return fnn.Conv(5 + self.num_classes, (1, 1), name="det_head")(features)


# --------------------------------------------------------------------------- #
# Synthetic shapes dataset (targets = dense SxS grid, built at generation)
# --------------------------------------------------------------------------- #

def generate_shapes_dataset(n: int = 512, image_size: int = 32, grid: int = 8,
                            max_objects: int = 3, seed: int = 0,
                            train: bool = True) -> ArrayDataset:
    """Images with 1..max_objects colored rectangles; target grid (S, S, 5+C):
    [objectness, cx_in_cell, cy_in_cell, w, h, class_index] (w/h normalized
    to image size; cx/cy relative within the assigned cell)."""
    rng = np.random.default_rng(seed + (0 if train else 1))
    c = len(SHAPE_CLASSES)
    imgs = np.zeros((n, image_size, image_size, 3), np.uint8)
    tgts = np.zeros((n, grid, grid, 5 + c), np.float32)
    cell = image_size / grid
    for i in range(n):
        imgs[i] = rng.integers(0, 40, (image_size, image_size, 3))  # dark noise bg
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
            gx, gy = min(grid - 1, int(cx * grid)), min(grid - 1, int(cy * grid))
            tgts[i, gy, gx, 0] = 1.0
            tgts[i, gy, gx, 1] = cx * grid - gx     # offset within cell [0,1)
            tgts[i, gy, gx, 2] = cy * grid - gy
            tgts[i, gy, gx, 3] = w
            tgts[i, gy, gx, 4] = h
            tgts[i, gy, gx, 5:] = 0.0
            tgts[i, gy, gx, 5 + cls] = 1.0
    return ArrayDataset(imgs, tgts, classes=list(SHAPE_CLASSES),
                        name=f"shapes_{'train' if train else 'test'}")


_dataset_loader("synthetic_shapes")(
    lambda root=None, train=True, n=512, image_size=32, grid=8, seed=0, **kw:
    generate_shapes_dataset(n=int(n), image_size=int(image_size),
                            grid=int(grid), seed=int(seed), train=train))


# --------------------------------------------------------------------------- #
# Loss / metrics / decoding
# --------------------------------------------------------------------------- #

def detection_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   box_weight: float = 5.0, noobj_weight: float = 0.5,
                   ) -> jnp.ndarray:
    """YOLOv1-style cell-matched loss over the dense grid.

    pred/target: (N, S, S, 5 + C). Objectness uses sigmoid-BCE everywhere
    (no-object cells down-weighted); box (sigmoid cx/cy/w/h vs targets)
    and class CE apply only on object cells.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    obj = target[..., 0]
    obj_logit = pred[..., 0]
    bce = jnp.maximum(obj_logit, 0) - obj_logit * obj + jnp.log1p(
        jnp.exp(-jnp.abs(obj_logit)))
    obj_loss = jnp.mean(jnp.where(obj > 0, bce, noobj_weight * bce))

    # cx/cy AND w/h through sigmoid (matches decode_detections: w/h are
    # fractions of the image, bounded (0, 1))
    box_pred = jax.nn.sigmoid(pred[..., 1:5])
    box_err = jnp.sum((box_pred - target[..., 1:5]) ** 2, axis=-1)
    n_obj = jnp.maximum(jnp.sum(obj), 1.0)
    box_loss = jnp.sum(obj * box_err) / n_obj

    logp = jax.nn.log_softmax(pred[..., 5:], axis=-1)
    cls_loss = -jnp.sum(obj * jnp.sum(target[..., 5:] * logp, axis=-1)) / n_obj
    return obj_loss + box_weight * box_loss + cls_loss


def objectness_accuracy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Cell-level objectness accuracy (balanced across obj/no-obj cells)."""
    obj = target[..., 0] > 0.5
    hit = (pred[..., 0] > 0) == obj
    acc_obj = jnp.sum(hit * obj) / jnp.maximum(jnp.sum(obj), 1)
    acc_no = jnp.sum(hit * ~obj) / jnp.maximum(jnp.sum(~obj), 1)
    return 0.5 * (acc_obj + acc_no)


def _cell_boxes(fields: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                s: int, raw: bool) -> jnp.ndarray:
    """Shared cell-offset -> normalized-xyxy decode for grid rows whose
    channels 1:5 are [cx_in_cell, cy_in_cell, w, h]. ``raw`` applies the
    prediction head's sigmoid; targets are stored post-sigmoid. The ONE
    copy of this math — predictions (decode_detections), prediction-vs-
    target IoU (mean_iou_on_objects) and ground truth (map50) all call it,
    so a target-encoding change cannot desynchronize the metrics."""
    cxy = jax.nn.sigmoid(fields[..., 1:3]) if raw else fields[..., 1:3]
    wh = jax.nn.sigmoid(fields[..., 3:5]) if raw else fields[..., 3:5]
    cx = (gx + cxy[..., 0]) / s
    cy = (gy + cxy[..., 1]) / s
    return jnp.stack([cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
                      cx + wh[..., 0] / 2, cy + wh[..., 1] / 2], axis=-1)


def mean_iou_on_objects(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean IoU between predicted and target boxes on object cells."""
    s = pred.shape[1]
    gx = jax.lax.broadcasted_iota(jnp.float32, pred.shape[:3], 2)
    gy = jax.lax.broadcasted_iota(jnp.float32, pred.shape[:3], 1)
    a = _cell_boxes(pred, gx, gy, s, raw=True)
    b = _cell_boxes(target, gx, gy, s, raw=False)
    iw = jnp.maximum(jnp.minimum(a[..., 2], b[..., 2])
                     - jnp.maximum(a[..., 0], b[..., 0]), 0)
    ih = jnp.maximum(jnp.minimum(a[..., 3], b[..., 3])
                     - jnp.maximum(a[..., 1], b[..., 1]), 0)
    inter = iw * ih
    union = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1]) \
        + (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    obj = target[..., 0]
    return jnp.sum(iou * obj) / jnp.maximum(jnp.sum(obj), 1)


def decode_detections(pred: jnp.ndarray, top_k: int = 16,
                      nms_iou: Optional[float] = None,
                      class_aware_nms: bool = True):
    """Dense grid -> top-k boxes: (boxes_xyxy (N,k,4), scores (N,k),
    classes (N,k)). jit-safe (static k). With ``nms_iou`` set, greedy NMS
    (ops/boxes.py, class-aware by default) runs per image INSIDE the same
    program — suppressed candidates keep their box but get score 0, so
    shapes stay static; filter on score > 0 downstream."""
    n, s, _, _ = pred.shape
    conf = jax.nn.sigmoid(pred[..., 0]).reshape(n, s * s)
    scores, idx = jax.lax.top_k(conf, top_k)
    flat = pred.reshape(n, s * s, -1)
    sel = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (N, k, 5+C)
    gy = (idx // s).astype(jnp.float32)
    gx = (idx % s).astype(jnp.float32)
    boxes = _cell_boxes(sel, gx, gy, s, raw=True)
    classes = jnp.argmax(sel[..., 5:], axis=-1)
    scores = _apply_nms(boxes, scores, classes, nms_iou, class_aware_nms)
    return boxes, scores, classes


def _apply_nms(boxes, scores, classes, nms_iou: Optional[float],
               class_aware: bool) -> jnp.ndarray:
    """Zero suppressed candidates' scores via per-image greedy NMS
    (ops/boxes.py) — the one copy both decoders share. No-op when
    ``nms_iou`` is None."""
    if nms_iou is None:
        return scores
    from deepcv_tpu.ops.boxes import batched_nms, nms as plain_nms
    if class_aware:
        keep = jax.vmap(lambda b, sc, cl: batched_nms(b, sc, cl, nms_iou))(
            boxes, scores, classes)
    else:
        keep = jax.vmap(lambda b, sc: plain_nms(b, sc, nms_iou))(
            boxes, scores)
    return jnp.where(keep, scores, 0.0)


def map50(pred: jnp.ndarray, target: jnp.ndarray,
          score_threshold: float = 0.0, top_k: int = 16) -> jnp.ndarray:
    """mAP@0.5 over the evaluated batch: decode + class-aware NMS on the
    predictions, ground truth read back off the dense grid, then
    VOC-style all-point AP per class averaged over classes present
    (ops/boxes.mean_average_precision). Fully jit-safe.

    The default ``score_threshold=0.0`` ranks ALL unsuppressed top-k
    detections (NMS zeroes suppressed scores exactly), matching the VOC
    protocol — thresholding the PR curve would understate AP and make it
    jump with calibration shifts. This metric is a sequential ranked scan
    (O(batch * top_k) steps) — register it through ``train()``'s
    ``eval_metrics`` so it runs per VALIDATION pass, not inside the jitted
    gradient step (train_detector wires it that way)."""
    from deepcv_tpu.ops.boxes import mean_average_precision

    n, s, _, ch = target.shape
    num_classes = ch - 5
    boxes, scores, classes = decode_detections(pred, top_k=top_k, nms_iou=0.5)
    pred_valid = scores > score_threshold

    flat = target.reshape(n, s * s, ch)
    gt_valid = flat[..., 0] > 0.5
    gy = (jnp.arange(s * s) // s).astype(jnp.float32)[None]
    gx = (jnp.arange(s * s) % s).astype(jnp.float32)[None]
    gt_boxes = _cell_boxes(flat, gx, gy, s, raw=False)
    gt_classes = jnp.argmax(flat[..., 5:], axis=-1)
    mAP, _ = mean_average_precision(boxes, scores, classes, pred_valid,
                                    gt_boxes, gt_classes, gt_valid,
                                    num_classes=num_classes)
    return mAP


# --------------------------------------------------------------------------- #
# Multi-scale (FPN) variant: flat dense-prediction layout over a pyramid
# --------------------------------------------------------------------------- #

def flat_grid_layout(grids: Tuple[int, ...]):
    """Static per-cell (gx, gy, grid_size) arrays for the flattened
    concatenation of several SxS levels (fine -> coarse) — the layout the
    FPN head emits and the FPN targets are stored in."""
    gx, gy, gs = [], [], []
    for s in grids:
        j = np.arange(s * s)
        gx.append(j % s)
        gy.append(j // s)
        gs.append(np.full(s * s, s))
    cat = lambda a: jnp.asarray(np.concatenate(a), jnp.float32)
    return cat(gx), cat(gy), cat(gs)


def generate_shapes_dataset_fpn(n: int = 512, image_size: int = 32,
                                grids: Tuple[int, ...] = (8, 4),
                                size_bounds: Tuple[float, ...] = (0.3,),
                                max_objects: int = 3, seed: int = 0,
                                train: bool = True) -> ArrayDataset:
    """Colored-rectangle images with MULTI-LEVEL flat targets
    (N, sum_l S_l^2, 5+C): each object is assigned to a pyramid level by
    size (max(w, h) <= size_bounds[l] -> level l, else the next coarser),
    then cell-matched within that level's grid — the FPN counterpart of
    :func:`generate_shapes_dataset`'s single-grid assignment."""
    if len(size_bounds) != len(grids) - 1:
        raise ValueError("need one size bound per level boundary "
                         f"({len(grids) - 1}), got {len(size_bounds)}")
    rng = np.random.default_rng(seed + (0 if train else 1))
    c = len(SHAPE_CLASSES)
    t_total = sum(s * s for s in grids)
    offsets = np.cumsum([0] + [s * s for s in grids])[:-1]
    imgs = np.zeros((n, image_size, image_size, 3), np.uint8)
    tgts = np.zeros((n, t_total, 5 + c), np.float32)
    for i in range(n):
        imgs[i] = rng.integers(0, 40, (image_size, image_size, 3))
        for _ in range(int(rng.integers(1, max_objects + 1))):
            w = rng.uniform(0.15, 0.6)
            h = rng.uniform(0.15, 0.6)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            cls = int(rng.integers(c))
            x0, x1 = int((cx - w / 2) * image_size), int((cx + w / 2) * image_size)
            y0, y1 = int((cy - h / 2) * image_size), int((cy + h / 2) * image_size)
            color = np.zeros(3, np.uint8)
            color[cls] = rng.integers(180, 256)
            imgs[i, y0:y1, x0:x1] = color
            lvl = int(np.searchsorted(np.asarray(size_bounds), max(w, h)))
            s = grids[lvl]
            gx, gy = min(s - 1, int(cx * s)), min(s - 1, int(cy * s))
            j = offsets[lvl] + gy * s + gx
            tgts[i, j, 0] = 1.0
            tgts[i, j, 1] = cx * s - gx
            tgts[i, j, 2] = cy * s - gy
            tgts[i, j, 3] = w
            tgts[i, j, 4] = h
            tgts[i, j, 5:] = 0.0
            tgts[i, j, 5 + cls] = 1.0
    return ArrayDataset(imgs, tgts, classes=list(SHAPE_CLASSES),
                        name=f"shapes_fpn_{'train' if train else 'test'}")


@_dataset_loader("synthetic_shapes_fpn")
def _load_shapes_fpn(root=None, train=True, n=512, image_size=32,
                     grids=(8, 4), size_bounds=None, max_objects=3,
                     seed=0, **kw):
    """Catalog loader: every generator knob is configurable from YAML —
    with >2 levels and no explicit bounds, boundaries are evenly spaced
    over the generator's (0.15, 0.6) object-size range."""
    grids = tuple(int(g) for g in grids)
    if size_bounds is None:
        k = len(grids) - 1
        # 2-level default matches the generator's documented (0.3,); deeper
        # pyramids get evenly spaced boundaries over the object-size range
        size_bounds = (0.3,) if k == 1 else tuple(
            round(0.15 + (0.6 - 0.15) * (i + 1) / (k + 1), 4)
            for i in range(k))
    return generate_shapes_dataset_fpn(
        n=int(n), image_size=int(image_size), grids=grids,
        size_bounds=tuple(float(b) for b in size_bounds),
        max_objects=int(max_objects), seed=int(seed), train=train)


def detection_loss_focal(pred: jnp.ndarray, target: jnp.ndarray,
                         gamma: float = 2.0, alpha: float = 0.25,
                         box_weight: float = 5.0) -> jnp.ndarray:
    """Focal-loss variant (Lin et al., arXiv:1708.02002) over the FLAT
    multi-level layout (N, T, 5+C): sigmoid focal BCE on objectness
    (handles the extreme cell imbalance an FPN's fine levels create —
    replacing the single-grid loss's fixed no-object down-weight), plus
    the same object-cell box MSE and class CE as :func:`detection_loss`.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    obj = target[..., 0]
    logit = pred[..., 0]
    bce = jnp.maximum(logit, 0) - logit * obj + jnp.log1p(
        jnp.exp(-jnp.abs(logit)))
    p_t = jnp.exp(-bce)                       # prob of the true label
    alpha_t = jnp.where(obj > 0, alpha, 1.0 - alpha)
    focal = alpha_t * (1.0 - p_t) ** gamma * bce
    n_obj = jnp.maximum(jnp.sum(obj), 1.0)
    obj_loss = jnp.sum(focal) / n_obj         # RetinaNet normalization

    box_pred = jax.nn.sigmoid(pred[..., 1:5])
    box_err = jnp.sum((box_pred - target[..., 1:5]) ** 2, axis=-1)
    box_loss = jnp.sum(obj * box_err) / n_obj
    logp = jax.nn.log_softmax(pred[..., 5:], axis=-1)
    cls_loss = -jnp.sum(obj * jnp.sum(target[..., 5:] * logp, axis=-1)) / n_obj
    return obj_loss + box_weight * box_loss + cls_loss


def decode_detections_flat(pred: jnp.ndarray, grids: Tuple[int, ...],
                           top_k: int = 16,
                           nms_iou: Optional[float] = None,
                           class_aware_nms: bool = True):
    """Flat multi-level grid (N, T, 5+C) -> top-k boxes across ALL levels
    (then optional class-aware NMS, which also merges duplicate detections
    of one object across pyramid levels — the multi-scale failure mode the
    single-grid decode never sees)."""
    n, t, _ = pred.shape
    gx, gy, gs = flat_grid_layout(grids)
    conf = jax.nn.sigmoid(pred[..., 0])
    scores, idx = jax.lax.top_k(conf, top_k)
    sel = jnp.take_along_axis(pred, idx[..., None], axis=1)
    boxes = _cell_boxes(sel, jnp.take(gx, idx), jnp.take(gy, idx),
                        jnp.take(gs, idx), raw=True)
    classes = jnp.argmax(sel[..., 5:], axis=-1)
    scores = _apply_nms(boxes, scores, classes, nms_iou, class_aware_nms)
    return boxes, scores, classes


def map50_flat(pred: jnp.ndarray, target: jnp.ndarray,
               grids: Tuple[int, ...], score_threshold: float = 0.0,
               top_k: int = 16) -> jnp.ndarray:
    """mAP@0.5 for the flat multi-level layout (same protocol as
    :func:`map50`; cross-level duplicates are collapsed by the class-aware
    NMS inside the decode). Register via ``functools.partial(map50_flat,
    grids=...)`` in ``train()``'s eval_metrics."""
    from deepcv_tpu.ops.boxes import mean_average_precision

    num_classes = target.shape[-1] - 5
    boxes, scores, classes = decode_detections_flat(pred, grids, top_k=top_k,
                                                    nms_iou=0.5)
    pred_valid = scores > score_threshold
    gx, gy, gs = flat_grid_layout(grids)
    gt_boxes = _cell_boxes(target, gx[None], gy[None], gs[None], raw=False)
    gt_valid = target[..., 0] > 0.5
    gt_classes = jnp.argmax(target[..., 5:], axis=-1)
    mAP, _ = mean_average_precision(boxes, scores, classes, pred_valid,
                                    gt_boxes, gt_classes, gt_valid,
                                    num_classes=num_classes)
    return mAP


def create_fpn_detector(datasets, model_params: Mapping[str, Any]
                        ) -> DeepcvModule:
    """Multi-scale detector: backbone-from-YAML whose spec gathers named
    feature levels (``_new_branch_from_tensor {_from: [c3, c4]}``); this
    node appends the FPN + RetinaNet-style shared head sized from the
    dataset (``fpn_channels`` model param, default 64). The model output
    is the flat (N, T_total, 5+C) tensor matching the FPN targets."""
    import copy
    trainset = datasets["trainset"]
    num_classes = trainset.dataset.targets.shape[-1] - 5
    hp = copy.deepcopy(dict(model_params))
    channels = int(hp.pop("fpn_channels", 64))
    hp["architecture"].append(
        {"fpn": {"channels": channels, "head_outputs": 5 + num_classes}})
    return DeepcvModule(trainset.image_shape, hp)


def train_fpn_detector(datasets, model: DeepcvModule, hp: Mapping[str, Any],
                       trackers=()):
    import functools
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    grids = tuple(int(g) for g in hp.get("fpn_grids", (8, 4)))
    # fpn_grids drives the decode/mAP cell layout; an equal-total mismatch
    # (e.g. reversed order) would corrupt the metric SILENTLY, so validate
    # both the fine->coarse convention and the total against the dataset
    if list(grids) != sorted(grids, reverse=True) \
            or len(set(grids)) != len(grids):
        raise ValueError(f"fpn_grids must be strictly fine->coarse "
                         f"(decreasing), got {grids}")
    t_total = sum(s * s for s in grids)
    t_ds = datasets["trainset"].dataset.targets.shape[1]
    if t_total != t_ds:
        raise ValueError(f"fpn_grids {grids} flatten to {t_total} cells but "
                         f"the dataset targets have {t_ds}")
    state, history = train_fn(
        hp, model, detection_loss_focal, datasets, backend_conf=backend,
        metrics={"objectness_accuracy": objectness_accuracy},
        eval_metrics={"map50": functools.partial(map50_flat, grids=grids)},
        loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


# --------------------------------------------------------------------------- #
# Pipeline
# --------------------------------------------------------------------------- #

def create_detector(datasets, model_params: Mapping[str, Any]) -> DeepcvModule:
    """Backbone-from-YAML ending in the dense head conv; the final conv's
    out_channels is forced to 5 + num_classes."""
    import copy
    trainset = datasets["trainset"]
    num_classes = trainset.dataset.targets.shape[-1] - 5
    hp = copy.deepcopy(dict(model_params))
    arch = hp["architecture"]
    # final layer must emit the head channels with no activation/norms
    arch.append({"conv2d": {"kernel_size": [1, 1], "out_channels": 5 + num_classes,
                            "padding": 0, "act_fn": None,
                            **{t: None for t in ("batch_norm", "group_norm",
                                                 "layer_norm")}}})
    return DeepcvModule(trainset.image_shape, hp)


def train_detector(datasets, model: DeepcvModule, hp: Mapping[str, Any],
                   trackers=()):
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, detection_loss, datasets,
                              backend_conf=backend,
                              metrics={"objectness_accuracy": objectness_accuracy,
                                       "mean_iou": mean_iou_on_objects},
                              # ranked sequential scan: validation pass only
                              eval_metrics={"map50": map50},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


def get_pipelines() -> Dict[str, Pipeline]:
    train_pipeline = Pipeline([
        Node(preprocess, ["shapes_train", "shapes_test",
                          "params:shapes_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_detector, ["datasets", "params:object_detector_model"],
             "model", name="create_detector"),
        Node(train_detector, ["datasets", "model",
                              "params:train_object_detector", "trackers"],
             "train_results", name="train"),
    ], name="train_object_detector", tags={"train", "detection"})
    fpn_pipeline = Pipeline([
        Node(preprocess, ["shapes_fpn_train", "shapes_fpn_test",
                          "params:shapes_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_fpn_detector, ["datasets",
                                   "params:fpn_detector_model"],
             "model", name="create_fpn_detector"),
        Node(train_fpn_detector, ["datasets", "model",
                                  "params:train_fpn_detector", "trackers"],
             "train_results", name="train"),
    ], name="train_fpn_detector", tags={"train", "detection"})
    return {"train_object_detector": train_pipeline,
            "train_fpn_detector": fpn_pipeline}
