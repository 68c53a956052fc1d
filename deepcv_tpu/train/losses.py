"""Loss functions + multi-loss weighting.

Reference parity:
  * multi-loss weighted mean with named terms and synthesized 'main_loss'
    (``_setup_ignite_losses``, /root/reference/src/deepcv/meta/
    ignite_training.py:138-176) -> :class:`WeightedLosses`;
  * AugMix Jensen-Shannon consistency loss (``deepcv.meta.contrastive``,
    contrastive.py:32-48) with stop-gradient on the clean logits;
  * label-smoothing cross-entropy (contrastive.py:55-91 — broken in the
    reference; implemented per its docstring intent);
  * triplet margin loss (contrastive.py:94).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from deepcv_tpu.utils import register

__all__ = [
    "cross_entropy_loss", "label_smoothing_xentropy_loss", "mse_loss", "l1_loss",
    "jensen_shannon_divergence_consistency_loss", "triplet_margin_loss",
    "distillation_loss", "distill_accuracy", "WeightedLosses", "LOSS_FNS",
]


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    if labels.ndim == 1 or labels.shape[-1] != num_classes:
        return jax.nn.one_hot(labels, num_classes)
    return labels


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean softmax cross-entropy; labels can be int classes or one-hot
    (torch.nn.CrossEntropyLoss parity, classification/image.py:70).

    Integer CLASS-INDEX labels outside [0, num_classes) are IGNORED
    (masked out of the mean) — torch's ``ignore_index`` semantics,
    generalized to any out-of-range label; the semi-supervised UDA mode
    marks unlabeled rows with -1. Integer ONE-HOT labels (one more axis,
    last dim == num_classes) take the plain one-hot path instead."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    labels = jnp.asarray(labels)
    if jnp.issubdtype(labels.dtype, jnp.integer) and labels.ndim == logits.ndim - 1:
        valid = (labels >= 0) & (labels < num_classes)
        y = _one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
        if label_smoothing:
            y = y * (1.0 - label_smoothing) + label_smoothing / num_classes
        rows = -jnp.sum(y * logp, axis=-1) * valid
        return jnp.sum(rows) / jnp.maximum(jnp.sum(valid), 1)
    y = _one_hot(labels, num_classes)
    if label_smoothing:
        y = y * (1.0 - label_smoothing) + label_smoothing / num_classes
    return -jnp.mean(jnp.sum(y * logp, axis=-1))


def label_smoothing_xentropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                                  smoothing: float = 0.1) -> jnp.ndarray:
    """Reference contrastive.py:55-91 intent (its impl was broken, SURVEY §8)."""
    return cross_entropy_loss(logits, labels, label_smoothing=smoothing)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def distillation_loss(student_logits: jnp.ndarray, targets: jnp.ndarray,
                      temperature: float = 4.0,
                      alpha: float = 0.5) -> jnp.ndarray:
    """Knowledge distillation (Hinton et al., arXiv:1503.02531) over
    PRECOMPUTED teacher logits: ``targets`` is (N, 1 + C) — column 0 the
    integer label, columns 1: the frozen teacher's logits (the layout
    :func:`deepcv_tpu.serve.distill_targets` produces). Loss =
    alpha * CE(student, label) + (1 - alpha) * T^2 * KL(teacher_T ||
    student_T). Precomputing the soft labels once (the teacher is frozen —
    its outputs never change) keeps the train step single-model: no
    teacher forward per step, no extra weights in HBM, standard offline
    distillation."""
    labels = targets[..., 0].astype(jnp.int32)
    t_logits = targets[..., 1:].astype(jnp.float32)
    s_logits = student_logits.astype(jnp.float32)
    hard = cross_entropy_loss(s_logits, labels)
    t = float(temperature)
    p_t = jax.nn.softmax(t_logits / t, axis=-1)
    logp_s = jax.nn.log_softmax(s_logits / t, axis=-1)
    logp_t = jax.nn.log_softmax(t_logits / t, axis=-1)
    kl = jnp.mean(jnp.sum(p_t * (logp_t - logp_s), axis=-1))
    return float(alpha) * hard + (1.0 - float(alpha)) * (t * t) * kl


def jensen_shannon_divergence_consistency_loss(logits_clean: jnp.ndarray,
                                               *logits_augmented: jnp.ndarray,
                                               ) -> jnp.ndarray:
    """AugMix JSD consistency (arXiv:1912.02781 eq. 4; reference
    contrastive.py:32-48): JS divergence between the clean prediction (no
    grad) and each augmented prediction.

    loss = mean_k KL(M || p_k) with M the mean distribution over
    {clean, aug_1, ..., aug_n}; gradient stopped on the clean branch.
    """
    p_clean = jax.lax.stop_gradient(
        jax.nn.softmax(logits_clean.astype(jnp.float32), axis=-1))
    ps = [p_clean] + [jax.nn.softmax(l.astype(jnp.float32), axis=-1)
                      for l in logits_augmented]
    m = sum(ps) / len(ps)
    log_m = jnp.log(jnp.clip(m, 1e-7, 1.0))

    def kl(p):  # KL(p || m)
        log_p = jnp.log(jnp.clip(p, 1e-7, 1.0))
        return jnp.sum(p * (log_p - log_m), axis=-1)

    return jnp.mean(sum(kl(p) for p in ps) / len(ps))


def triplet_margin_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                        negative: jnp.ndarray, margin: float = 1.0,
                        p: int = 2) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss parity (reference contrastive.py:94)."""
    def dist(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        if p == 2:
            return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        return jnp.sum(jnp.abs(d) ** p, axis=-1) ** (1.0 / p)

    return jnp.mean(jnp.maximum(dist(anchor, positive) - dist(anchor, negative)
                                + margin, 0.0))


LOSS_FNS: Dict[str, Callable] = {
    "cross_entropy": cross_entropy_loss,
    "distillation": distillation_loss,
    "label_smoothing_xentropy": label_smoothing_xentropy_loss,
    "mse": mse_loss,
    "l1": l1_loss,
    "jsd_consistency": jensen_shannon_divergence_consistency_loss,
    "triplet_margin": triplet_margin_loss,
}
for _n, _f in LOSS_FNS.items():
    register(f"loss:{_n}", _f)
    register(_n, _f) if _n not in ("mse", "l1") else None


def distill_accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Accuracy against the hard label in a distillation target layout
    (column 0 of the (N, 1+C) targets distill_targets produces)."""
    return jnp.mean((jnp.argmax(logits, -1)
                     == targets[..., 0].astype(jnp.int32)).astype(jnp.float32))


class WeightedLosses:
    """Named loss terms with weights; computes per-term values and the
    weighted-mean 'main_loss' (reference ``_setup_ignite_losses``,
    ignite_training.py:138-176: single / sequence / mapping forms)."""

    MAIN = "main_loss"

    def __init__(self, losses: Union[Callable, Sequence[Callable], Mapping[str, Any]],
                 weights: Optional[Union[Sequence[float], Mapping[str, float]]] = None):
        if isinstance(losses, str):
            losses = {losses: LOSS_FNS[losses]}
        elif callable(losses):
            losses = {"loss": losses}
        elif isinstance(losses, (list, tuple)):
            losses = {getattr(f, "__name__", f"loss_{i}"): f for i, f in enumerate(losses)}
        self.terms: Dict[str, Callable] = {}
        self.weights: Dict[str, float] = {}
        for i, (name, spec) in enumerate(dict(losses).items()):
            if isinstance(spec, (tuple, list)) and len(spec) == 2 and callable(spec[0]):
                fn, w = spec
            else:
                fn, w = spec, 1.0
            if isinstance(fn, str):
                fn = LOSS_FNS[fn]
            self.terms[name] = fn
            self.weights[name] = float(w)
        if weights is not None:
            if isinstance(weights, Mapping):
                self.weights.update({k: float(v) for k, v in weights.items()})
            else:
                for name, w in zip(self.terms, weights):
                    self.weights[name] = float(w)
        total = sum(self.weights.values())
        if total <= 0:
            raise ValueError("Loss weights must sum to a positive value")
        self._norm = total

    def __call__(self, *args, **kwargs) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns (main_loss, {term_name: value, 'main_loss': main})."""
        values = {name: fn(*args, **kwargs) for name, fn in self.terms.items()}
        main = sum(self.weights[n] * v for n, v in values.items()) / self._norm
        values[self.MAIN] = main
        return main, values

    def __len__(self):
        return len(self.terms)

    def __repr__(self):
        return f"WeightedLosses({ {n: self.weights[n] for n in self.terms} })"


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
