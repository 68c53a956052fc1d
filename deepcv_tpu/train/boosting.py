"""Boosting — sequential weak-learner ensembles with sample reweighting.

The reference planned "more tools for faster deep learning model
convergence and generalization, thanks to active learning, boosting and
meta-learning techniques" (reference README.md:171) and never started the
boosting part (active learning and meta-learning live in
``train/active_learning.py`` / ``train/meta_learning.py``). This module
builds the boosting leg TPU-first:

- **SAMME multi-class AdaBoost** (Zhu et al. 2009, "Multi-class AdaBoost"):
  each round trains a weak learner against the current sample weights, its
  weighted error sets the member vote ``alpha = log((1-err)/err) +
  log(C-1)``, and misclassified samples are up-weighted for the next round.
  The final predictor is the alpha-weighted vote over member predictions.
- **One compiled program per phase, reused across rounds**: the inner
  trainer is a single ``lax.scan`` of weighted-cross-entropy SGD steps
  (weights enter the LOSS, so batches stay uniform gathers from the
  device-resident dataset — no host-side weighted sampling, no dynamic
  shapes); full-set prediction is a padded chunked scan; the reweighting
  update is one tiny jit. Shapes never change between rounds, so every
  round after the first hits the jit cache.
- Works with any spec model exposing ``init/apply`` — batch-statistics
  models are supported (the stats thread through the scan carry exactly as
  in the main train loop).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["adaboost_train", "BoostedEnsemble"]

_logger = logging.getLogger(__name__)


def _weighted_ce(logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    return jnp.sum(ce * w) / (jnp.sum(w) + 1e-12)


class BoostedEnsemble:
    """Alpha-weighted-vote predictor over SAMME members.

    ``predict`` returns class ids; ``vote_scores`` returns the (N, C) vote
    mass (sum of member alphas behind each class) for thresholding or
    inspection.
    """

    def __init__(self, model, members: Sequence[Dict[str, Any]],
                 alphas: Sequence[float], num_classes: int):
        if len(members) != len(alphas) or not members:
            raise ValueError("BoostedEnsemble needs one alpha per member "
                             "(and at least one member)")
        self.model = model
        self.members = list(members)
        self.alphas = [float(a) for a in alphas]
        self.num_classes = int(num_classes)
        self._predict_one = jax.jit(
            lambda variables, x: jnp.argmax(
                model.apply(variables, x, train=False), axis=-1))

    def vote_scores(self, images) -> np.ndarray:
        x = jnp.asarray(images)
        votes = jnp.zeros((x.shape[0], self.num_classes), jnp.float32)
        for variables, alpha in zip(self.members, self.alphas):
            pred = self._predict_one(variables, x)
            votes = votes + alpha * jax.nn.one_hot(pred, self.num_classes)
        return np.asarray(votes)

    def predict(self, images) -> np.ndarray:
        return np.argmax(self.vote_scores(images), axis=-1)

    def accuracy(self, images, labels) -> float:
        return float(np.mean(self.predict(images) == np.asarray(labels)))


def adaboost_train(model, images, labels, *, rounds: int = 5,
                   num_classes: Optional[int] = None, inner_steps: int = 100,
                   batch_size: int = 64, lr: float = 0.05,
                   momentum: float = 0.9, eval_batch: int = 512,
                   seed: int = 0, log_every: int = 0,
                   ) -> Tuple[BoostedEnsemble, Dict[str, list]]:
    """SAMME AdaBoost over ``rounds`` weak learners of ``model``'s spec.

    Each member starts from a fresh seeded init and trains ``inner_steps``
    SGD steps of weighted cross-entropy (weights normalized inside each
    batch). Rounds stop early when a member is no better than chance on the
    weighted distribution (err >= 1 - 1/C, its vote would be <= 0) or when
    it is perfect (err ~ 0 — nothing left to reweight).

    Returns ``(BoostedEnsemble, history)`` with per-round weighted error,
    alpha, and plain train accuracy of the boosted vote so far.
    """
    images = jnp.asarray(images)
    labels = jnp.asarray(labels, jnp.int32)
    n = int(images.shape[0])
    c = int(num_classes) if num_classes else int(jnp.max(labels)) + 1
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    tx = optax.sgd(lr, momentum=momentum or None)

    def _split_out(out):
        return out if isinstance(out, tuple) else (out, {})

    def train_round(variables, w, key):
        params = variables["params"]
        bs = variables.get("batch_stats")
        opt_state = tx.init(params)

        def step(carry, k):
            params, bs, opt_state = carry
            idx = jax.random.randint(jax.random.fold_in(k, 1), (batch_size,), 0, n)
            xb, yb, wb = images[idx], labels[idx], w[idx]

            def loss_fn(p):
                v = {"params": p}
                if bs is not None:
                    v["batch_stats"] = bs
                out = model.apply(v, xb, train=True,
                                  rngs={"dropout": jax.random.fold_in(k, 2)},
                                  mutable=["batch_stats"] if bs is not None else False)
                logits, st = _split_out(out)
                new_bs = st.get("batch_stats", bs) if hasattr(st, "get") else bs
                return _weighted_ce(logits, yb, wb), new_bs

            (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, new_opt = tx.update(g, opt_state, params)
            return (optax.apply_updates(params, upd), new_bs, new_opt), loss

        keys = jax.random.split(key, inner_steps)
        (params, bs, _), losses = jax.lax.scan(step, (params, bs, opt_state), keys)
        out = {"params": params}
        if bs is not None:
            out["batch_stats"] = bs
        return out, losses

    # full-trainset predictions: pad to a whole number of eval chunks so ONE
    # program serves every round (tail masked by the caller via n)
    eb = min(eval_batch, n)
    n_pad = (-n) % eb
    x_pad = jnp.concatenate([images, jnp.zeros((n_pad,) + images.shape[1:],
                                               images.dtype)]) \
        if n_pad else images
    chunks = x_pad.reshape((-1, eb) + images.shape[1:])

    def predict_train(variables):
        def body(_, xb):
            return None, jnp.argmax(model.apply(variables, xb, train=False), -1)
        _, preds = jax.lax.scan(body, None, chunks)
        return preds.reshape(-1)[:n]

    def reweight(w, pred):
        wrong = (pred != labels).astype(jnp.float32)
        err = jnp.sum(w * wrong) / (jnp.sum(w) + 1e-12)
        alpha = jnp.log((1.0 - err) / jnp.maximum(err, 1e-12)) + np.log(c - 1)
        w2 = w * jnp.exp(alpha * wrong)
        return w2 / (jnp.sum(w2) + 1e-12), err, alpha

    train_round_j = jax.jit(train_round)
    predict_train_j = jax.jit(predict_train)
    reweight_j = jax.jit(reweight)

    w = jnp.full((n,), 1.0 / n, jnp.float32)
    members: List[Dict[str, Any]] = []
    alphas: List[float] = []
    history: Dict[str, list] = {"err": [], "alpha": [], "vote_accuracy": []}
    root = jax.random.PRNGKey(seed)
    for k in range(rounds):
        init_key, train_key = jax.random.split(jax.random.fold_in(root, k))
        variables = model.init(init_key)
        fitted, _ = train_round_j(variables, w, train_key)
        pred = predict_train_j(fitted)
        w_next, err, alpha = reweight_j(w, pred)
        err_f, alpha_f = float(err), float(alpha)
        if err_f >= 1.0 - 1.0 / c:
            # no better than chance on the weighted distribution: its vote
            # would be <= 0 — discard and stop (SAMME termination rule)
            _logger.info("adaboost round %d: err %.3f >= 1-1/C, stopping "
                         "without this member", k, err_f)
            break
        members.append(jax.device_get(fitted))
        # cap a perfect member's vote so it cannot infinitely outvote others
        alphas.append(min(alpha_f, 20.0))
        history["err"].append(err_f)
        history["alpha"].append(alphas[-1])
        ens = BoostedEnsemble(model, members, alphas, c)
        history["vote_accuracy"].append(ens.accuracy(images, labels))
        if log_every and (k + 1) % log_every == 0:
            _logger.info("adaboost %d/%d: err %.3f alpha %.3f vote acc %.3f",
                         k + 1, rounds, err_f, alphas[-1],
                         history["vote_accuracy"][-1])
        if err_f <= 1e-8:
            _logger.info("adaboost round %d: perfect member, stopping", k)
            break
        w = w_next
    if not members:
        raise RuntimeError("adaboost_train: the first weak learner was no "
                           "better than chance — train it longer "
                           "(inner_steps/lr) or use a stronger spec")
    return BoostedEnsemble(model, members, alphas, c), history
