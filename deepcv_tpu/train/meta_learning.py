"""Meta-learning for fast adaptation — Reptile episodic training.

The reference planned "more tools for faster deep learning model
convergence and generalization, thanks to active learning, boosting and
meta-learning techniques" (reference README.md:167) and never started the
meta-learning part. This module builds it TPU-first:

- **Reptile** (arXiv:1803.02999) rather than MAML: the same episodic
  few-shot objective but FIRST-ORDER — no differentiation through the
  inner optimization, so the inner loop is a plain ``lax.scan`` of SGD
  steps and a whole meta-batch of episodes runs as ONE jitted program
  (inner loops vmapped over episodes). Memory stays O(meta_batch x
  params) with no second-derivative graph.
- **Static episode shapes**: every episode is a fixed (n_way x k_shot)
  support tensor and (n_way x q_queries) query tensor, so episode
  sampling is host-side index arithmetic and the compiled program never
  sees ragged shapes — one XLA program for the entire meta-training run.

Works with any pure-params model exposing ``apply({'params': p}, x)``
logits (a `DeepcvModule` with its head sized to ``n_way``). Models with
batch statistics are rejected up front: inner-loop BN state on support
sets is a known few-shot failure mode — use group/layer norm.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_episodes", "reptile_train", "adapt", "episode_accuracy"]

_logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------- #
# Episode sampling (host side, static shapes)
# --------------------------------------------------------------------------- #

def sample_episodes(images: np.ndarray, labels: np.ndarray, *, n_way: int,
                    k_shot: int, q_queries: int, n_episodes: int,
                    rng: np.random.Generator,
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Draw ``n_episodes`` N-way K-shot episodes.

    Returns (support_x (E, N*K, ...), support_y (E, N*K), query_x
    (E, N*Q, ...), query_y (E, N*Q)) with labels RELABELED 0..n_way-1 per
    episode (the few-shot convention: class identity is episode-local).
    Every episode has identical shape, so the meta-step compiles once.
    """
    labels = np.asarray(labels).astype(np.int64)
    classes = np.unique(labels)
    if len(classes) < n_way:
        raise ValueError(f"need >= {n_way} classes for {n_way}-way episodes, "
                         f"dataset has {len(classes)}")
    by_class = {c: np.flatnonzero(labels == c) for c in classes}
    need = k_shot + q_queries
    for c, idx in by_class.items():
        if len(idx) < need:
            raise ValueError(f"class {c} has {len(idx)} examples, "
                             f"episodes need k_shot+q_queries={need}")
    sx, sy, qx, qy = [], [], [], []
    for _ in range(n_episodes):
        way = rng.choice(classes, size=n_way, replace=False)
        s_idx, q_idx = [], []
        for new_label, c in enumerate(way):
            pick = rng.choice(by_class[c], size=need, replace=False)
            s_idx.append(pick[:k_shot])
            q_idx.append(pick[k_shot:])
        s_idx, q_idx = np.concatenate(s_idx), np.concatenate(q_idx)
        sx.append(images[s_idx])
        qx.append(images[q_idx])
        sy.append(np.repeat(np.arange(n_way), k_shot))
        qy.append(np.repeat(np.arange(n_way), q_queries))
    return (np.stack(sx), np.stack(sy).astype(np.int32),
            np.stack(qx), np.stack(qy).astype(np.int32))


# --------------------------------------------------------------------------- #
# Inner loop + meta step
# --------------------------------------------------------------------------- #

def _check_pure_params(variables: Dict[str, Any]) -> None:
    if "batch_stats" in variables:
        raise ValueError(
            "meta-learning needs a pure-params model: batch statistics "
            "updated on 5-shot support sets are garbage (the classic "
            "few-shot BN failure) — build the model with group_norm/"
            "layer_norm instead of batch_norm")


def _ce(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                         axis=1))


def _inner_sgd(apply_fn: Callable, params, x, y, steps: int, lr: float):
    """``steps`` SGD steps on the support loss, as one lax.scan."""
    def loss_fn(p):
        return _ce(apply_fn({"params": p}, x), y)

    def step(p, _):
        g = jax.grad(loss_fn)(p)
        return jax.tree_util.tree_map(lambda w, gw: w - lr * gw, p, g), None

    return jax.lax.scan(step, params, None, length=steps)[0]


def reptile_train(model, images: np.ndarray, labels: np.ndarray, *,
                  n_way: int = 4, k_shot: int = 5, q_queries: int = 5,
                  meta_steps: int = 100, meta_batch: int = 4,
                  inner_steps: int = 5, inner_lr: float = 0.05,
                  meta_lr: float = 0.5, meta_lr_final: float = 0.05,
                  seed: int = 0, variables: Optional[Dict[str, Any]] = None,
                  log_every: int = 0) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Reptile meta-training: params that ADAPT FAST to unseen classes.

    Each meta-step samples ``meta_batch`` episodes, runs ``inner_steps`` of
    SGD per episode (vmapped — one compiled program), and moves the meta
    params toward the mean adapted params: theta += eps * mean(phi - theta)
    with eps linearly annealed meta_lr -> meta_lr_final (the paper's
    schedule). Returns (variables, history with per-meta-step query
    accuracy of the ADAPTED models — the metric that matters in few-shot).
    """
    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed))
    _check_pure_params(variables)
    params = variables["params"]
    apply_fn = partial(model.apply, train=False)
    rng = np.random.default_rng(seed)

    v_adapt = jax.vmap(lambda p, x, y: _inner_sgd(apply_fn, p, x, y,
                                                  inner_steps, inner_lr),
                       in_axes=(None, 0, 0))

    @jax.jit
    def meta_step(params, sx, sy, qx, qy, eps):
        adapted = v_adapt(params, sx, sy)                 # (E, ...) pytree
        delta = jax.tree_util.tree_map(
            lambda a, p: jnp.mean(a, axis=0) - p, adapted, params)
        new = jax.tree_util.tree_map(lambda p, d: p + eps * d, params, delta)
        # adapted-model query accuracy (the few-shot metric)
        logits = jax.vmap(lambda p, x: apply_fn({"params": p}, x))(adapted, qx)
        acc = jnp.mean(jnp.argmax(logits, -1) == qy)
        return new, acc

    history: Dict[str, list] = {"query_accuracy": [], "meta_lr": []}
    for t in range(meta_steps):
        sx, sy, qx, qy = sample_episodes(
            images, labels, n_way=n_way, k_shot=k_shot, q_queries=q_queries,
            n_episodes=meta_batch, rng=rng)
        frac = t / max(meta_steps - 1, 1)
        eps = meta_lr + (meta_lr_final - meta_lr) * frac
        params, acc = meta_step(params, jnp.asarray(sx), jnp.asarray(sy),
                                jnp.asarray(qx), jnp.asarray(qy),
                                jnp.float32(eps))
        history["query_accuracy"].append(float(acc))
        history["meta_lr"].append(float(eps))
        if log_every and (t + 1) % log_every == 0:
            _logger.info("reptile %d/%d: adapted query acc %.3f",
                         t + 1, meta_steps, float(acc))
    out = dict(variables)
    out["params"] = jax.device_get(params)
    return out, history


def adapt(model, variables: Dict[str, Any], support_x, support_y, *,
          steps: int = 10, lr: float = 0.05) -> Dict[str, Any]:
    """Few-shot adaptation: fine-tune a (meta-trained) model on one
    episode's support set. Returns new variables; jit-compiled scan."""
    _check_pure_params(variables)
    apply_fn = partial(model.apply, train=False)
    fitted = jax.jit(partial(_inner_sgd, apply_fn, steps=steps, lr=lr))(
        variables["params"], jnp.asarray(support_x), jnp.asarray(support_y))
    out = dict(variables)
    out["params"] = fitted
    return out


def episode_accuracy(model, variables: Dict[str, Any], query_x, query_y,
                     ) -> float:
    """Query-set accuracy of (adapted) variables on one episode."""
    logits = model.apply(variables, jnp.asarray(query_x), train=False)
    return float(jnp.mean(jnp.argmax(logits, -1)
                          == jnp.asarray(query_y, jnp.int32)))
