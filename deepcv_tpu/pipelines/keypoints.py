"""Keypoints task: encoder/decoder autoencoder + descriptor matching.

Reference parity:
  * /root/reference/src/deepcv/keypoints/detector.py:35-84 — encoder +
    decoder DeepcvModules trained jointly as an autoencoder (per
    arXiv:1906.07889, unsupervised keypoint detection pretraining), pipeline
    ``train_keypoint_detector``;
  * /root/reference/src/deepcv/keypoints/matching.py — a stub in the
    reference; implemented here: dense descriptor extraction + mutual-NN
    matching (BASELINE config #4), all-pairs distances on the MXU;
  * AdaLAM-style match outlier filtering (reference README TODO :148
    "Reuse outlier filtering technique for feature keypoint matching ...
    AdaLAM", arXiv:2006.04250) — :func:`filter_matches_adalam`, re-designed
    for XLA: static seed/hypothesis counts, vmapped similarity-RANSAC.
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
           "Autoencoder", "extract_dense_descriptors", "match_descriptors",
           "filter_matches_adalam"]

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


def filter_matches_adalam(coords_a: jnp.ndarray, coords_b: jnp.ndarray,
                          matches: jnp.ndarray, valid: jnp.ndarray,
                          scores: Optional[jnp.ndarray] = None, *,
                          key: Optional[jax.Array] = None,
                          n_seeds: int = 32, n_hypotheses: int = 16,
                          seed_radius: float = 8.0,
                          neighborhood_radius: float = 24.0,
                          inlier_tol: float = 3.0, min_inliers: int = 6,
                          ) -> jnp.ndarray:
    """AdaLAM-style outlier filtering of putative matches (arXiv:2006.04250;
    reference README TODO :148 — never started there).

    The full AdaLAM pipeline is (1) spread-out, locally-best SEED matches,
    (2) assignment of every match to nearby seeds in BOTH images, (3) local
    affine verification with adaptive RANSAC per seed. This is that design
    re-shaped for XLA: every stage is a fixed-shape masked tensor program —
    ``n_seeds`` seeds picked by score + spatial non-max suppression, a
    (seeds, matches) neighborhood mask, and per-seed similarity-transform
    RANSAC (2-point minimal solver in complex form, ``n_hypotheses``
    hypotheses each) vmapped over seeds.  A match survives when it is an
    inlier of some seed's best local model that has >= ``min_inliers``
    support.  O(S*T*A) residual work, no data-dependent shapes, jittable.

    Args: ``coords_a`` (A, 2) and ``coords_b`` (B, 2) keypoint positions
    ((y, x) as produced by :func:`extract_keypoints`); ``matches`` (A,)
    indices into b (:func:`match_descriptors` output); ``valid`` (A,) mask;
    ``scores`` optional (A,) match quality (defaults to uniform).
    Returns the refined (A,) boolean mask (a subset of ``valid``).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    a = coords_a.astype(jnp.float32)                       # (A, 2)
    b = coords_b.astype(jnp.float32)[matches]              # (A, 2) matched pos
    A = a.shape[0]
    sc = (jnp.ones((A,), jnp.float32) if scores is None
          else scores.astype(jnp.float32))
    sc = jnp.where(valid, sc, -jnp.inf)

    # ---- 1. seeds: locally-best valid matches, spread by seed_radius ----
    da = jnp.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)   # (A, A)
    near = da <= seed_radius
    local_best = sc >= jnp.max(jnp.where(near, sc[None, :], -jnp.inf), axis=1)
    seed_score = jnp.where(local_best & valid, sc, -jnp.inf)
    _, seed_idx = jax.lax.top_k(seed_score, min(n_seeds, A))       # (S,)
    seed_ok = jnp.isfinite(seed_score[seed_idx])                   # real seeds

    # ---- 2. neighborhoods: close to the seed in BOTH images ----
    d_seed_a = jnp.linalg.norm(a[seed_idx][:, None, :] - a[None, :, :], axis=-1)
    d_seed_b = jnp.linalg.norm(b[seed_idx][:, None, :] - b[None, :, :], axis=-1)
    neigh = ((d_seed_a <= neighborhood_radius)
             & (d_seed_b <= neighborhood_radius)
             & valid[None, :] & seed_ok[:, None])                  # (S, A)

    # ---- 3. per-seed similarity RANSAC (complex 2-point solver) ----
    za = a[:, 0] + 1j * a[:, 1]                                    # (A,) complex
    zb = b[:, 0] + 1j * b[:, 1]

    def verify_seed(mask, k):
        # sample 2 distinct neighbor matches per hypothesis via gumbel top-2
        # over the neighborhood mask (uniform among neighbors)
        g = jax.random.gumbel(k, (n_hypotheses, A))
        g = jnp.where(mask[None, :], g, -jnp.inf)
        _, pick = jax.lax.top_k(g, 2)                              # (T, 2)
        p1, p2 = za[pick[:, 0]], za[pick[:, 1]]                    # (T,)
        q1, q2 = zb[pick[:, 0]], zb[pick[:, 1]]
        dp = p2 - p1
        degenerate = jnp.abs(dp) < 1e-6
        alpha = (q2 - q1) / jnp.where(degenerate, 1.0, dp)         # scale+rot
        beta = q1 - alpha * p1
        resid = jnp.abs(alpha[:, None] * za[None, :] + beta[:, None]
                        - zb[None, :])                             # (T, A)
        # AdaLAM's scale-adaptive threshold: tolerance in image-b pixels,
        # grown with the local scale so zoom-ins aren't over-pruned
        tol = inlier_tol * jnp.maximum(1.0, jnp.abs(alpha))[:, None]
        inl = (resid <= tol) & mask[None, :] & ~degenerate[:, None]
        counts = jnp.sum(inl, axis=1)                              # (T,)
        best = jnp.argmax(counts)
        return inl[best], counts[best]

    keys = jax.random.split(key, neigh.shape[0])
    inliers, counts = jax.vmap(verify_seed)(neigh, keys)           # (S, A), (S,)
    supported = counts >= min_inliers                              # (S,)
    confirmed = jnp.any(inliers & supported[:, None], axis=0)      # (A,)
    return confirmed & valid


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
