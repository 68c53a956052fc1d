"""Object-detection task package.

Reference parity: /root/reference/src/deepcv/detection/detector.py — a stub
in the reference (``get_pipelines() -> {}``, :29-30; the module only sketches
a YOLO-like intent in comments). Kept minimal here on purpose: the registry
entry exists so the pipeline surface matches, and a single-stage dense head
helper is provided as the starting point for a future round.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import flax.linen as fnn

from deepcv_tpu.pipelines.framework import Pipeline

__all__ = ["get_pipelines", "DenseDetectionHead"]


class DenseDetectionHead(fnn.Module):
    """Per-cell (objectness + box + class) prediction head over a feature map
    — the single-stage detector head the reference planned (detector.py
    comments). Output: (N, H, W, anchors * (5 + num_classes))."""
    num_classes: int
    num_anchors: int = 3

    @fnn.compact
    def __call__(self, features, *, train: bool = False):
        out_ch = self.num_anchors * (5 + self.num_classes)
        return fnn.Conv(out_ch, (1, 1), name="det_head")(features)


def get_pipelines() -> Dict[str, Pipeline]:
    # reference parity: no working detection pipeline yet (detector.py:29-30)
    return {}
