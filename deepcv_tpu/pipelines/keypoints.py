"""Keypoints task: encoder/decoder autoencoder + descriptor matching.

Reference parity:
  * /root/reference/src/deepcv/keypoints/detector.py:35-84 — encoder +
    decoder DeepcvModules trained jointly as an autoencoder (per
    arXiv:1906.07889, unsupervised keypoint detection pretraining), pipeline
    ``train_keypoint_detector``;
  * /root/reference/src/deepcv/keypoints/matching.py — a stub in the
    reference; implemented here: dense descriptor extraction + mutual-NN
    matching (BASELINE config #4), all-pairs distances on the MXU.
"""
from __future__ import annotations

import copy
import logging
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from deepcv_tpu.pipelines.framework import Node, Pipeline, \
    preprocess_node as preprocess
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.train import train as train_fn
from deepcv_tpu.train.backend import BackendConfig
from deepcv_tpu.train.losses import mse_loss

__all__ = ["get_pipelines", "create_autoencoder", "train_autoencoder",
           "Autoencoder", "extract_dense_descriptors", "match_descriptors"]

_logger = logging.getLogger(__name__)


class Autoencoder:
    """Encoder+decoder pair with a DeepcvModule-compatible init/apply
    (reference wraps them in ``torch.nn.Sequential(encoder, decoder)``,
    keypoints/detector.py:60)."""

    def __init__(self, encoder: DeepcvModule, decoder: DeepcvModule):
        self.encoder = encoder
        self.decoder = decoder
        self.input_shape = encoder.input_shape

    def init(self, rng, batch_size: int = 1):
        if not hasattr(rng, "shape"):
            rng = jax.random.PRNGKey(int(rng))
        enc_v = self.encoder.init(rng, batch_size)
        dec_v = self.decoder.init(jax.random.fold_in(rng, 1), batch_size)
        out = {"params": {"encoder": enc_v["params"], "decoder": dec_v["params"]}}
        bs = {}
        if "batch_stats" in enc_v:
            bs["encoder"] = enc_v["batch_stats"]
        if "batch_stats" in dec_v:
            bs["decoder"] = dec_v["batch_stats"]
        if bs:
            out["batch_stats"] = bs
        return out

    def _split(self, variables, part: str):
        v = {"params": variables["params"][part]}
        if "batch_stats" in variables and part in variables["batch_stats"]:
            v["batch_stats"] = variables["batch_stats"][part]
        return v

    def apply(self, variables, x, *, train: bool = False, rngs=None, mutable=None):
        enc_out = self.encoder.apply(self._split(variables, "encoder"), x,
                                     train=train, rngs=rngs)
        new_bs: Dict[str, Any] = {}
        if isinstance(enc_out, tuple):
            z, st = enc_out
            new_bs["encoder"] = st.get("batch_stats")
        else:
            z = enc_out
        dec_out = self.decoder.apply(self._split(variables, "decoder"), z,
                                     train=train, rngs=rngs)
        if isinstance(dec_out, tuple):
            y, st = dec_out
            new_bs["decoder"] = st.get("batch_stats")
        else:
            y = dec_out
        if train and new_bs:
            return y, {"batch_stats": {k: v for k, v in new_bs.items() if v is not None}}
        return y

    def encode(self, variables, x):
        return self.encoder.apply(self._split(variables, "encoder"), x, train=False)


def create_autoencoder(datasets, encoder_params: Mapping[str, Any],
                       decoder_params: Mapping[str, Any]) -> Autoencoder:
    """Build encoder+decoder; the decoder's final conv is sized to reconstruct
    the input channels (reference keypoints/detector.py:44-59)."""
    trainset = datasets["trainset"]
    input_shape = trainset.image_shape
    encoder = DeepcvModule(input_shape, copy.deepcopy(dict(encoder_params)))
    enc_out = encoder.eval_output_shape()
    dec_hp = copy.deepcopy(dict(decoder_params))
    # ensure reconstruction matches input channel count: append a projection
    arch = dec_hp.get("architecture", [])
    arch.append({"conv2d": {"kernel_size": [3, 3], "out_channels": input_shape[-1],
                            "padding": 1, "act_fn": "sigmoid",
                            **{t: None for t in ("batch_norm", "group_norm")}}})
    decoder = DeepcvModule(tuple(enc_out[1:]), dec_hp)
    return Autoencoder(encoder, decoder)


def train_autoencoder(datasets, model: Autoencoder, hp: Mapping[str, Any],
                      trackers=()):
    hp = dict(hp)
    hp["self_supervised_target"] = "input"
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, mse_loss, datasets,
                              backend_conf=backend,
                              metrics={"reconstruction_mse": mse_loss},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


# --------------------------------------------------------------------------- #
# Keypoint extraction (arXiv:1906.07889 inference side)
# --------------------------------------------------------------------------- #

def extract_keypoints(score_map: jnp.ndarray, k: int = 64,
                      nms_window: int = 3, min_score: float = 0.0):
    """Top-k local maxima of a detection score map -> (coords, scores).

    ``score_map``: (N, H, W) or (N, H, W, 1). Local-maximum test via
    max-pooling (a pixel survives when it equals its neighborhood max —
    pure VPU work), then a single top_k. Returns coords (N, k, 2) as (y, x)
    and scores (N, k); entries below ``min_score`` get score -inf.
    """
    import flax.linen as fnn_

    if score_map.ndim == 4:
        score_map = score_map[..., 0]
    n, h, w = score_map.shape
    s4 = score_map[..., None]
    pooled = fnn_.max_pool(s4, (nms_window, nms_window), strides=(1, 1),
                           padding="SAME")[..., 0]
    is_peak = (score_map >= pooled) & (score_map > min_score)
    masked = jnp.where(is_peak, score_map, -jnp.inf)
    flat = masked.reshape(n, h * w)
    scores, idx = jax.lax.top_k(flat, k)
    coords = jnp.stack([idx // w, idx % w], axis=-1)
    return coords, scores


# --------------------------------------------------------------------------- #
# Descriptor matching (BASELINE config #4)
# --------------------------------------------------------------------------- #

def extract_dense_descriptors(feature_map: jnp.ndarray,
                              l2_normalize: bool = True) -> jnp.ndarray:
    """(N, H, W, C) feature maps -> (N, H*W, C) dense descriptors."""
    n, h, w, c = feature_map.shape
    d = feature_map.reshape(n, h * w, c).astype(jnp.float32)
    if l2_normalize:
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    return d


def match_descriptors(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      mutual: bool = True, max_distance: Optional[float] = None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs match: returns (indices_into_b_for_each_a, valid_mask).

    Distance matrix is one (A, C) x (C, B) matmul on the MXU (for
    L2-normalized descriptors, argmin distance == argmax dot product), then
    mutual-nearest-neighbor filtering.
    """
    sim = desc_a @ desc_b.T                       # (A, B) — MXU
    best_b = jnp.argmax(sim, axis=1)              # best b for each a
    valid = jnp.ones((desc_a.shape[0],), bool)
    if mutual:
        best_a = jnp.argmax(sim, axis=0)          # best a for each b
        valid = best_a[best_b] == jnp.arange(desc_a.shape[0])
    if max_distance is not None:
        # ||a-b||^2 = 2 - 2 a.b for unit vectors
        d2 = 2.0 - 2.0 * jnp.take_along_axis(sim, best_b[:, None], axis=1)[:, 0]
        valid = valid & (d2 <= max_distance ** 2)
    return best_b, valid


def get_pipelines() -> Dict[str, Pipeline]:
    train_pipeline = Pipeline([
        Node(preprocess, ["cifar10_train", "cifar10_test",
                          "params:cifar10_preprocessing"],
             "datasets", name="preprocess"),
        Node(create_autoencoder, ["datasets", "params:keypoints_encoder_model",
                                  "params:keypoints_decoder_model"],
             "model", name="create_autoencoder"),
        Node(train_autoencoder, ["datasets", "model",
                                 "params:train_keypoint_detector", "trackers"],
             "train_results", name="train"),
    ], name="train_keypoint_detector", tags={"train", "keypoints"})
    return {"train_keypoint_detector": train_pipeline}
