"""Video task package: deep-feature-flow inference scaffold.

Reference parity: /root/reference/src/deepcv/video/ —
  * ``deep_feature_flow.py:14-40``: key-frame features propagated to
    non-key frames via optical flow (arXiv:1611.07715); the propagation
    functions are stubs in the reference. Here the generator structure is
    implemented and the warp is a real bilinear flow-warp; the flow network
    itself remains pluggable (reference ``FlowNetV2`` placeholder,
    optical_flow.py:15-21).
  * tracking: empty in the reference (tracking.py, ``__all__ = []``) —
    implemented here as a real jit-safe SORT tracker in
    ``pipelines/tracking.py`` (fixed-capacity track table, vmapped Kalman,
    lax.scan over frames).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from deepcv_tpu.pipelines.framework import Pipeline

__all__ = ["get_pipelines", "flow_warp", "deep_feature_flow_inference",
           "interpolate_frames", "generate_clip_dataset",
           "TemporalVideoModel", "create_temporal_model"]


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
                # local correlation volume (displacements in {-1,0,1}^2): the
                # direction signal every real flow net feeds its decoder
                corrs = []
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        shifted = jnp.roll(b_warped, (dy, dx), axis=(1, 2))
                        corrs.append(jnp.mean(a * shifted, axis=-1, keepdims=True))
                corr = jnp.concatenate(corrs, axis=-1)
                x = jnp.concatenate([a, b_warped, corr, flow], axis=-1)
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


# --------------------------------------------------------------------------- #
# Trainable optical-flow pipeline (beyond the reference's stubs)
# --------------------------------------------------------------------------- #

class FlowModel:
    """DeepcvModule-compatible facade over SimpleFlowNet taking a packed
    6-channel (frame_a ++ frame_b) input — so the standard train() runtime
    drives it unchanged."""

    def __init__(self, input_shape, levels: int = 2, features: int = 16):
        # input_shape: (H, W, 2*C) packed pair
        self.input_shape = tuple(input_shape)
        self._c = self.input_shape[-1] // 2
        self.net = SimpleFlowNet(levels=levels, features=features)

    def init(self, rng, batch_size: int = 1):
        if not hasattr(rng, "shape"):
            rng = jax.random.PRNGKey(int(rng))
        h, w, _ = self.input_shape
        return self.net.init(rng, (h, w, self._c))

    def apply(self, variables, x, *, train: bool = False, rngs=None, mutable=None):
        a = x[..., :self._c]
        b = x[..., self._c:]
        return self.net.apply(variables, a, b)

    def capacity(self) -> int:
        from deepcv_tpu.ops.nn import get_model_capacity
        v = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        return get_model_capacity(v["params"])


def generate_flow_dataset(n: int = 512, image_size: int = 32,
                          max_shift: int = 4, seed: int = 0, train: bool = True):
    """Synthetic flow pairs: textured frames translated by a known (dx, dy);
    x = packed (a ++ b) uint8, target = dense backward flow (H, W, 2)."""
    import numpy as np
    from deepcv_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed + (0 if train else 1))
    big = image_size + 2 * max_shift
    xs = np.zeros((n, image_size, image_size, 6), np.uint8)
    flows = np.zeros((n, image_size, image_size, 2), np.float32)
    for i in range(n):
        canvas = rng.integers(0, 256, (big, big, 3), np.uint8)
        # add structure: a few bright rectangles (texture for matching)
        for _ in range(4):
            y0, x0 = rng.integers(0, big - 8, 2)
            canvas[y0:y0 + 8, x0:x0 + 8] = rng.integers(128, 256, 3)
        dx, dy = rng.integers(-max_shift, max_shift + 1, 2)
        a = canvas[max_shift:max_shift + image_size,
                   max_shift:max_shift + image_size]
        b = canvas[max_shift + dy:max_shift + dy + image_size,
                   max_shift + dx:max_shift + dx + image_size]
        xs[i, ..., :3] = a
        xs[i, ..., 3:] = b
        # backward flow in flow_warp's convention out(y,x) = img(y+fy, x+fx):
        # b[r,c] = a[r+dy, c+dx], so a[r,c] = b[r-dy, c-dx] — the target that
        # reconstructs a from b is (-dx, -dy). Verified: flow_warp(b, target)
        # == a exactly on interior pixels (a +dx,+dy target warps AWAY from a)
        flows[i, ..., 0] = -dx
        flows[i, ..., 1] = -dy
    return ArrayDataset(xs, flows, name=f"flow_{'train' if train else 'test'}")


def interpolate_frames(frame_a: jnp.ndarray, frame_b: jnp.ndarray, *,
                       flow: Optional[jnp.ndarray] = None,
                       flow_fn: Optional[Callable] = None,
                       t: float = 0.5) -> jnp.ndarray:
    """Flow-based intermediate-frame synthesis (reference README TODO
    "more sophisticated video inference interpolation ... conditioned on
    previous frames", README.md:170-171 — never started there).

    ``flow`` is the backward flow satisfying ``a(p) = b(p + flow(p))`` —
    the convention of :func:`flow_warp` and the trained ``FlowModel``
    (pass ``flow_fn(a, b) -> flow`` to estimate it here). The frame at
    time ``t`` (0 = a, 1 = b) warps BOTH endpoints along linearly scaled
    flow and blends them with (1-t, t) weights — each endpoint dominates
    near its own time, hiding the other's disocclusion artifacts::

        x_t(p) = (1-t) * a(p + t*(-flow)) + t * b(p + (1-t)*flow)
    """
    if (flow is None) == (flow_fn is None):
        raise ValueError("pass exactly one of flow= or flow_fn=")
    if flow is None:
        flow = flow_fn(frame_a, frame_b)
    t = float(t)
    from_a = flow_warp(frame_a.astype(jnp.float32), -t * flow)
    from_b = flow_warp(frame_b.astype(jnp.float32), (1.0 - t) * flow)
    return (1.0 - t) * from_a + t * from_b


def generate_clip_dataset(n: int = 512, frames: int = 6, image_size: int = 12,
                          seed: int = 0, train: bool = True):
    """Synthetic video-classification task: a bright dot moves in one of 4
    directions (wrapping); the label IS the motion direction — unsolvable
    from any single frame, so only genuinely temporal models (conv3d over
    the (F, H, W, C) clip) learn it. Exercises the N-D dispatch's rank-3
    path end to end."""
    import numpy as np
    from deepcv_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed + (0 if train else 1))
    f, s = int(frames), int(image_size)
    clips = np.zeros((n, f, s, s, 3), np.uint8)
    labels = rng.integers(0, 4, n)
    dirs = {0: (1, 0), 1: (-1, 0), 2: (0, 1), 3: (0, -1)}
    for i in range(n):
        dy, dx = dirs[int(labels[i])]
        y0, x0 = rng.integers(0, s, 2)
        color = rng.integers(128, 256, 3)
        for t in range(f):
            clips[i, t, (y0 + dy * t) % s, (x0 + dx * t) % s] = color
    return ArrayDataset(clips, labels.astype(np.int64),
                        classes=["down", "up", "right", "left"],
                        name=f"clips_{'train' if train else 'test'}")


from deepcv_tpu.data.datasets import _dataset_loader as _reg_loader  # noqa: E402

_reg_loader("synthetic_flow")(
    lambda root=None, train=True, n=512, image_size=32, max_shift=4, seed=0, **kw:
    generate_flow_dataset(n=int(n), image_size=int(image_size),
                          max_shift=int(max_shift), seed=int(seed), train=train))

_reg_loader("synthetic_clips")(
    lambda root=None, train=True, n=512, frames=6, image_size=12, seed=0, **kw:
    generate_clip_dataset(n=int(n), frames=int(frames),
                          image_size=int(image_size), seed=int(seed),
                          train=train))


# --------------------------------------------------------------------------- #
# Timeseries models over high-level video features (reference README.md:168
# "Implement timeseries models for high-level (low dimensionality) video
# features understanding" — a pure TODO there). Contrast with the conv3d
# video classifier above: frames are first reduced to LOW-DIM embeddings by
# a shared 2-D encoder, then a timeseries model (temporal transformer or a
# scanned GRU) reasons over the embedding SEQUENCE. TPU-native shape: the
# encoder folds frames into the batch (one (N*F, H, W, C) conv program —
# large MXU batches, no per-frame dispatch), the GRU is a lax.scan over the
# frame axis, the transformer treats frames as tokens.
# --------------------------------------------------------------------------- #
_TEMPORAL_NET_CLS = None


def _build_temporal_net():
    global _TEMPORAL_NET_CLS
    if _TEMPORAL_NET_CLS is not None:
        return _TEMPORAL_NET_CLS
    import flax.linen as fnn
    from deepcv_tpu.ops.attention import TransformerEncoderBlock

    class TemporalNet(fnn.Module):
        """Shared per-frame encoder -> (N, F, D) sequence -> temporal head.

        ``temporal``: 'transformer' (learned frame positions + pre-LN
        encoder blocks), 'gru' (scanned GRUCell, final hidden state), or
        'mean' (order-blind mean-pool CONTROL — provably cannot solve
        motion-direction tasks, kept as the ablation baseline).

        ``pool``: how a frame's conv map becomes its low-dim feature.
        'soft_argmax' (default) takes each channel's EXPECTED normalized
        (y, x) coordinate under a spatial softmax — position-preserving and
        translation-equivariant, so motion is a per-channel coordinate
        delta the timeseries head can read off; 'gap' is global average
        pooling (position-blind — fine for appearance tasks, provably
        insufficient for motion).
        """
        n_classes: int
        embed_dim: int = 32
        temporal: str = "transformer"
        encoder_features: tuple = (16, 32)
        encoder_strides: tuple = (2, 2)
        pool: str = "soft_argmax"
        num_heads: int = 4
        n_blocks: int = 1
        mlp_ratio: int = 2
        dropout_prob: float = 0.0

        @fnn.compact
        def __call__(self, clips, *, train: bool = False):
            if clips.ndim != 5:
                raise ValueError(f"expected (N, F, H, W, C) clips, got "
                                 f"{clips.shape}")
            n, f = clips.shape[0], clips.shape[1]
            x = clips.reshape((n * f,) + clips.shape[2:])
            strides = tuple(self.encoder_strides)
            if len(strides) != len(self.encoder_features):
                raise ValueError("encoder_strides must match "
                                 "encoder_features length")
            for i, feats in enumerate(self.encoder_features):
                x = fnn.Conv(int(feats), (3, 3),
                             strides=(int(strides[i]),) * 2,
                             name=f"enc_conv_{i}")(x)
                x = fnn.GroupNorm(num_groups=min(4, int(feats)),
                                  name=f"enc_gn_{i}")(x)
                x = fnn.gelu(x)
            if self.pool == "soft_argmax":
                nf, hh, ww, cc = x.shape
                p = jax.nn.softmax(x.reshape(nf, hh * ww, cc), axis=1)
                ys, xs = jnp.meshgrid(jnp.linspace(-1.0, 1.0, hh),
                                      jnp.linspace(-1.0, 1.0, ww),
                                      indexing="ij")
                coords = jnp.stack([ys.ravel(), xs.ravel()], axis=-1)
                # (NF, HW, C) x (HW, 2) -> per-channel expected coords
                x = jnp.einsum("nhc,hk->nck", p, coords).reshape(nf, 2 * cc)
            elif self.pool == "gap":
                x = x.mean(axis=(1, 2))                  # (N*F, C)
            else:
                raise ValueError(f"unknown pool '{self.pool}' "
                                 "(expected soft_argmax|gap)")
            e = fnn.Dense(self.embed_dim, name="embed")(x)
            e = e.reshape(n, f, self.embed_dim)
            if self.temporal == "transformer":
                pos = self.param("pos_embedding",
                                 fnn.initializers.normal(0.02),
                                 (1, f, self.embed_dim))
                h = e + pos
                for i in range(self.n_blocks):
                    h = TransformerEncoderBlock(
                        num_heads=self.num_heads,
                        mlp_dim=self.embed_dim * self.mlp_ratio,
                        dropout_prob=self.dropout_prob,
                        name=f"block_{i}")(h, train=train)
                h = fnn.LayerNorm(name="ln_final")(h).mean(axis=1)
            elif self.temporal == "gru":
                scan_cell = fnn.scan(fnn.GRUCell,
                                     variable_broadcast="params",
                                     split_rngs={"params": False},
                                     in_axes=1, out_axes=1)
                carry = jnp.zeros((n, self.embed_dim), e.dtype)
                h, _ = scan_cell(features=self.embed_dim, name="gru")(carry, e)
            elif self.temporal == "mean":
                h = e.mean(axis=1)
            else:
                raise ValueError(f"unknown temporal model '{self.temporal}' "
                                 "(expected transformer|gru|mean)")
            return fnn.Dense(self.n_classes, name="head")(h)

    _TEMPORAL_NET_CLS = TemporalNet
    return TemporalNet


class TemporalVideoModel:
    """DeepcvModule-compatible facade over the temporal-features net, so the
    standard ``train()`` runtime and classification nodes drive it unchanged
    (same protocol as :class:`FlowModel`)."""

    def __init__(self, input_shape, n_classes: int,
                 temporal: str = "transformer", **net_kwargs):
        self.input_shape = tuple(input_shape)            # (F, H, W, C)
        if len(self.input_shape) != 4:
            raise ValueError(f"TemporalVideoModel expects (F, H, W, C) "
                             f"input_shape, got {self.input_shape}")
        self.net = _build_temporal_net()(
            n_classes=int(n_classes), temporal=str(temporal), **net_kwargs)

    def init(self, rng, batch_size: int = 1):
        if not hasattr(rng, "shape"):
            rng = jax.random.PRNGKey(int(rng))
        probe = jnp.zeros((batch_size,) + self.input_shape, jnp.float32)
        return self.net.init(rng, probe)

    def apply(self, variables, x, *, train: bool = False, rngs=None,
              mutable=None):
        kwargs = {"rngs": rngs} if rngs else {}
        y = self.net.apply(variables, x, train=train, **kwargs)
        return (y, {}) if mutable else y

    def capacity(self) -> int:
        from deepcv_tpu.ops.nn import get_model_capacity
        v = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        return get_model_capacity(v["params"])


def create_temporal_model(datasets, model_params) -> TemporalVideoModel:
    trainset = datasets["trainset"]
    p = dict(model_params or {})
    return TemporalVideoModel(
        trainset.image_shape, n_classes=trainset.num_classes,
        temporal=str(p.get("temporal", "transformer")),
        embed_dim=int(p.get("embed_dim", 32)),
        encoder_features=tuple(int(c) for c in
                               p.get("encoder_features", (16, 32))),
        encoder_strides=tuple(int(s) for s in
                              p.get("encoder_strides", (2, 2))),
        pool=str(p.get("pool", "soft_argmax")),
        num_heads=int(p.get("num_heads", 4)),
        n_blocks=int(p.get("n_blocks", 1)),
        dropout_prob=float(p.get("dropout_prob", 0.0)))


def endpoint_error(pred_flow: jnp.ndarray, target_flow: jnp.ndarray) -> jnp.ndarray:
    """Average endpoint error (EPE) — the standard optical-flow metric."""
    return jnp.mean(jnp.sqrt(jnp.sum(
        (pred_flow.astype(jnp.float32) - target_flow.astype(jnp.float32)) ** 2,
        axis=-1) + 1e-12))


def create_flow_model(datasets, model_params) -> FlowModel:
    trainset = datasets["trainset"]
    p = dict(model_params or {})
    return FlowModel(trainset.image_shape, levels=int(p.get("levels", 2)),
                     features=int(p.get("features", 16)))


def train_flow(datasets, model: FlowModel, hp, trackers=()):
    from deepcv_tpu.train import train as train_fn
    from deepcv_tpu.train.backend import BackendConfig
    from deepcv_tpu.train.losses import mse_loss

    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, mse_loss, datasets,
                              backend_conf=backend,
                              metrics={"epe": endpoint_error},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


def get_pipelines() -> Dict[str, Pipeline]:
    from deepcv_tpu.pipelines.framework import Node

    from deepcv_tpu.pipelines.framework import preprocess_node as preprocess

    from deepcv_tpu.pipelines.classification import create_model
    from deepcv_tpu.pipelines.classification import train as train_classifier

    flow_pipeline = Pipeline([
        Node(preprocess, ["flow_train", "flow_test", "params:flow_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_flow_model, ["datasets", "params:optical_flow_model"],
             "model", name="create_flow_model"),
        Node(train_flow, ["datasets", "model", "params:train_optical_flow",
                          "trackers"],
             "train_results", name="train"),
    ], name="train_optical_flow", tags={"train", "video"})
    # video classification: a conv3d spec over (F, H, W, C) clips — the
    # classifier nodes are rank-agnostic (input shape comes from the data)
    clip_pipeline = Pipeline([
        Node(preprocess, ["clips_train", "clips_test",
                          "params:clips_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_model, ["datasets", "params:video_classifier_model"],
             "model", name="create_model"),
        Node(train_classifier, ["datasets", "model",
                                "params:train_video_classifier", "trackers"],
             "train_results", name="train"),
    ], name="train_video_classifier", tags={"train", "video"})
    # timeseries model over per-frame embeddings (README.md:168): same data,
    # but the model is encoder -> embedding sequence -> temporal transformer
    temporal_pipeline = Pipeline([
        Node(preprocess, ["clips_train", "clips_test",
                          "params:clips_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_temporal_model, ["datasets",
                                     "params:temporal_classifier_model"],
             "model", name="create_model"),
        Node(train_classifier, ["datasets", "model",
                                "params:train_temporal_classifier",
                                "trackers"],
             "train_results", name="train"),
    ], name="train_temporal_classifier", tags={"train", "video"})
    return {"train_optical_flow": flow_pipeline,
            "train_video_classifier": clip_pipeline,
            "train_temporal_classifier": temporal_pipeline}
