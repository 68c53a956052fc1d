"""Video task package: deep-feature-flow inference scaffold.

Reference parity: /root/reference/src/deepcv/video/ —
  * ``deep_feature_flow.py:14-40``: key-frame features propagated to
    non-key frames via optical flow (arXiv:1611.07715); the propagation
    functions are stubs in the reference. Here the generator structure is
    implemented and the warp is a real bilinear flow-warp; the flow network
    itself remains pluggable (reference ``FlowNetV2`` placeholder,
    optical_flow.py:15-21).
  * tracking: empty in the reference — registry entry kept empty.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from deepcv_tpu.pipelines.framework import Pipeline

__all__ = ["get_pipelines", "flow_warp", "deep_feature_flow_inference"]


def flow_warp(features: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp (N, H, W, C) features by (N, H, W, 2) backward flow (dx, dy)
    with bilinear sampling — the core op of deep feature flow."""
    n, h, w, c = features.shape
    jj, ii = jnp.meshgrid(jnp.arange(w, dtype=flow.dtype),
                          jnp.arange(h, dtype=flow.dtype))
    sx = jj[None] + flow[..., 0]
    sy = ii[None] + flow[..., 1]

    def warp_one(img, sxo, syo):
        x0 = jnp.floor(sxo)
        y0 = jnp.floor(syo)
        dx = sxo - x0
        dy = syo - y0

        def gather(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            vals = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                       jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
            return jnp.where(valid[..., None], vals, 0.0)

        top = gather(y0, x0) * (1 - dx)[..., None] + gather(y0, x0 + 1) * dx[..., None]
        bot = gather(y0 + 1, x0) * (1 - dx)[..., None] + gather(y0 + 1, x0 + 1) * dx[..., None]
        return top * (1 - dy)[..., None] + bot * dy[..., None]

    return jax.vmap(warp_one)(features, sx, sy)


def deep_feature_flow_inference(frames: Iterator[jnp.ndarray],
                                feature_fn: Callable,
                                flow_fn: Callable,
                                task_head_fn: Callable,
                                key_frame_interval: int = 10):
    """Generator over per-frame predictions (reference
    deep_feature_flow.py:14-40): run the heavy ``feature_fn`` only on key
    frames; intermediate frames warp the cached key-frame features by
    ``flow_fn(key_frame, frame)`` and run only the light ``task_head_fn``.
    """
    key_frame = None
    key_features = None
    for i, frame in enumerate(frames):
        if i % key_frame_interval == 0 or key_features is None:
            key_frame = frame
            key_features = feature_fn(frame)
            features = key_features
        else:
            flow = flow_fn(key_frame, frame)
            features = flow_warp(key_features, flow)
        yield task_head_fn(features)


class SimpleFlowNet:
    """Small pyramidal optical-flow estimator (working replacement for the
    reference ``FlowNetV2`` placeholder, optical_flow.py:15-21).

    Coarse-to-fine: at each pyramid level a small conv stack refines the
    upsampled flow from the coarser level, taking (frame_a, warped frame_b,
    current flow) as input. Pluggable as ``flow_fn`` in
    :func:`deep_feature_flow_inference` after training.
    """

    def __init__(self, levels: int = 3, features: int = 32):
        import flax.linen as fnn
        from deepcv_tpu.ops import nn as dnn

        self.levels = levels

        class _Refiner(fnn.Module):
            features: int = 32

            @fnn.compact
            def __call__(self, a, b_warped, flow):
                x = jnp.concatenate([a, b_warped, flow], axis=-1)
                x = dnn.pad_channels_for_tpu(x)
                x = jax.nn.relu(fnn.Conv(self.features, (3, 3), padding="SAME",
                                         name="c1")(x))
                x = jax.nn.relu(fnn.Conv(self.features, (3, 3), padding="SAME",
                                         name="c2")(x))
                return fnn.Conv(2, (3, 3), padding="SAME", name="out")(x)

        self._refiner = _Refiner(features=features)

    def init(self, rng, image_shape=(32, 32, 3)):
        h, w, c = image_shape
        a = jnp.zeros((1, h, w, c))
        return self._refiner.init(rng, a, a, jnp.zeros((1, h, w, 2)))

    def apply(self, variables, frame_a: jnp.ndarray, frame_b: jnp.ndarray
              ) -> jnp.ndarray:
        """(N,H,W,C) pair -> (N,H,W,2) backward flow, coarse-to-fine."""
        from deepcv_tpu.ops.nn import interpolate

        h, w = frame_a.shape[1:3]
        flow = jnp.zeros((frame_a.shape[0],
                          max(1, h // 2 ** (self.levels - 1)),
                          max(1, w // 2 ** (self.levels - 1)), 2),
                         frame_a.dtype)
        for lvl in reversed(range(self.levels)):
            hw = (max(1, h // 2 ** lvl), max(1, w // 2 ** lvl))
            a = interpolate(frame_a, hw)
            b = interpolate(frame_b, hw)
            flow = interpolate(flow, hw) * (hw[0] / max(1, flow.shape[1]))
            b_w = flow_warp(b, flow)
            flow = flow + self._refiner.apply(variables, a, b_w, flow)
        return flow


def get_pipelines() -> Dict[str, Pipeline]:
    # reference parity: video training pipelines are WIP stubs (video/*);
    # deep_feature_flow_inference + SimpleFlowNet are the working runtime parts
    return {}
