"""Box ops: IoU, non-maximum suppression, batch mAP — static-shape jnp.

Reference parity++: /root/reference/src/deepcv/detection/detector.py is a
stub; its sketched single-stage-detector intent needs the standard box
toolbox this module provides. Everything here is TPU-idiomatic: fixed
shapes (candidate counts are compile-time constants, validity carried as
masks), no data-dependent Python control flow — suppression and greedy
matching are `lax.fori_loop`/`lax.scan` over precomputed IoU matrices, so
the whole decode→NMS→mAP path stays inside one jitted program instead of
round-tripping boxes to the host the way CPU detectors do.

Shapes: boxes are (..., 4) in xyxy order (normalized or pixel, as long as
both sides agree).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["box_iou", "nms", "batched_nms", "soft_nms",
           "mean_average_precision"]


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix between two sets of xyxy boxes.

    a: (..., M, 4), b: (..., N, 4) -> (..., M, N). Degenerate (zero-area)
    boxes get IoU 0 rather than NaN.
    """
    a = a[..., :, None, :]                       # (..., M, 1, 4)
    b = b[..., None, :, :]                       # (..., 1, N, 4)
    iw = jnp.maximum(jnp.minimum(a[..., 2], b[..., 2])
                     - jnp.maximum(a[..., 0], b[..., 0]), 0.0)
    ih = jnp.maximum(jnp.minimum(a[..., 3], b[..., 3])
                     - jnp.maximum(a[..., 1], b[..., 1]), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) \
        * jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) \
        * jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        score_threshold: Optional[float] = None) -> jnp.ndarray:
    """Greedy NMS over a FIXED set of N candidates -> boolean keep mask (N,).

    Matches torchvision.ops.nms semantics (descending-score greedy
    suppression at IoU > threshold) but stays jit-safe: instead of
    returning a variable-length index list, it returns a mask — callers
    zero suppressed scores or gather under the mask. The greedy pass is a
    `fori_loop` of N vectorized steps over a precomputed (N, N) IoU
    matrix: sequential in N (NMS is inherently order-dependent) but each
    step is one fused vector op, which is the right trade for the small
    post-top-k candidate counts this runs on (N <= a few hundred).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = box_iou(boxes[order], boxes[order])     # sorted-order IoU
    valid = jnp.ones((n,), bool) if score_threshold is None \
        else scores[order] > score_threshold

    def body(i, keep):
        # if candidate i survived, suppress every LOWER-scored overlap
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, valid)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, iou_threshold: float = 0.5,
                score_threshold: Optional[float] = None) -> jnp.ndarray:
    """Class-aware NMS: boxes of different classes never suppress each
    other. Uses the coordinate-offset trick (one NMS pass over boxes
    translated by class_id * span, torchvision's batched_nms) so the cost
    is identical to one plain :func:`nms`.
    """
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = classes.astype(boxes.dtype)[..., None] * span
    return nms(boxes + offset, scores, iou_threshold, score_threshold)


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             method: str = "gaussian", sigma: float = 0.5,
             iou_threshold: float = 0.3) -> jnp.ndarray:
    """Soft-NMS (Bodla et al., arXiv:1704.04503): instead of binary
    suppression, overlapping candidates' scores DECAY — 'gaussian'
    (s *= exp(-iou^2 / sigma)) or 'linear' (s *= 1 - iou when iou >
    threshold). Returns the rescored (N,) vector; rank or threshold it
    downstream. Same static-shape greedy structure as :func:`nms`
    (fori_loop of N vectorized steps over the precomputed IoU matrix),
    matching the classic sequential algorithm exactly: each round picks
    the highest CURRENT (already-decayed) score among unprocessed boxes.
    """
    if method not in ("gaussian", "linear"):
        raise ValueError(f"soft_nms method must be 'gaussian' or 'linear', "
                         f"got {method!r}")
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(_, carry):
        s, done = carry
        cand = jnp.where(done, -jnp.inf, s)
        j = jnp.argmax(cand)
        row = iou[j]
        if method == "linear":
            decay = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        else:
            decay = jnp.exp(-(row ** 2) / sigma)
        keep_own = done | (jnp.arange(n) == j)
        s = jnp.where(keep_own, s, s * decay)
        return s, done.at[j].set(True)

    s, _ = jax.lax.fori_loop(0, n, body, (scores.astype(jnp.float32),
                                          jnp.zeros((n,), bool)))
    return s


def mean_average_precision(pred_boxes: jnp.ndarray, pred_scores: jnp.ndarray,
                           pred_classes: jnp.ndarray, pred_valid: jnp.ndarray,
                           gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                           gt_valid: jnp.ndarray, num_classes: int,
                           iou_threshold: float = 0.5
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mAP@IoU over a batch of images, fully inside jnp (jit-safe).

    Pascal-VOC-style all-point-interpolated AP per class, averaged over
    the classes that have ground truth. Predictions are ranked globally
    across the batch (this IS dataset-level mAP when the batch is the
    whole eval set — document the batch scope when reporting otherwise).

    pred_boxes (N, P, 4), pred_scores/classes/valid (N, P);
    gt_boxes (N, G, 4), gt_classes/valid (N, G); returns (mAP scalar,
    per-class AP (num_classes,)).

    Greedy matching follows the standard protocol: predictions in
    descending-score order claim their best-IoU unmatched same-class
    ground truth (IoU >= threshold); later predictions on a consumed GT
    are false positives. The consume step is sequential by definition —
    implemented as one `lax.scan` over the N*P ranked predictions carrying
    the matched-GT mask.
    """
    n, p, _ = pred_boxes.shape
    g = gt_boxes.shape[1]
    # (N, P, G) IoU between each image's predictions and its GTs
    iou = box_iou(pred_boxes, gt_boxes)
    img_of = jnp.broadcast_to(jnp.arange(n)[:, None], (n, p)).reshape(-1)
    flat_scores = pred_scores.reshape(-1)
    flat_cls = pred_classes.reshape(-1)
    flat_valid = pred_valid.reshape(-1)
    flat_iou = iou.reshape(n * p, g)               # row k: pred k vs ITS gts

    def ap_for_class(c):
        pv = flat_valid & (flat_cls == c)
        gv = gt_valid & (gt_classes == c)          # (N, G)
        n_gt = jnp.sum(gv.astype(jnp.float32))
        order = jnp.argsort(-jnp.where(pv, flat_scores, -jnp.inf))

        def step(matched, k):
            # matched: (N, G) consumed-GT mask; k: flat pred index
            row_iou = jnp.where(gv[img_of[k]] & ~matched[img_of[k]],
                                flat_iou[k], -1.0)
            best = jnp.argmax(row_iou)
            hit = (row_iou[best] >= iou_threshold) & pv[k]
            matched = matched.at[img_of[k], best].set(
                matched[img_of[k], best] | hit)
            return matched, hit.astype(jnp.float32)

        _, tp_ranked = jax.lax.scan(step, jnp.zeros((n, g), bool), order)
        # tp_ranked is already in ranked order; recompute valid in that order
        v = pv[order].astype(jnp.float32)
        cum_tp = jnp.cumsum(tp_ranked)
        cum_fp = jnp.cumsum(v - tp_ranked)
        recall = cum_tp / jnp.maximum(n_gt, 1.0)
        precision = cum_tp / jnp.maximum(cum_tp + cum_fp, 1e-12)
        prec_env = jax.lax.associative_scan(jnp.maximum, precision[::-1])[::-1]
        delta_r = jnp.diff(recall, prepend=0.0)
        return jnp.where(n_gt > 0, jnp.sum(prec_env * delta_r), jnp.nan)

    per_class = jax.vmap(ap_for_class)(jnp.arange(num_classes))
    present = ~jnp.isnan(per_class)
    mAP = jnp.sum(jnp.where(present, per_class, 0.0)) \
        / jnp.maximum(jnp.sum(present), 1)
    return mAP, jnp.where(present, per_class, 0.0)
