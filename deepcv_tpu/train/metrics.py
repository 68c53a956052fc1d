"""Evaluation metrics (ignite.metrics parity: Accuracy + per-term Loss,
reference ignite_training.py:48, 138-176) as pure jnp reductions aggregated
across eval batches by the runtime."""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import jax.numpy as jnp

from deepcv_tpu.utils import register

__all__ = ["accuracy", "top_k_accuracy", "METRIC_FNS", "MetricAccumulator"]


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of argmax predictions equal to int labels."""
    if labels.ndim > 1 and labels.shape[-1] == logits.shape[-1]:
        labels = jnp.argmax(labels, axis=-1)
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    if labels.ndim > 1 and labels.shape[-1] == logits.shape[-1]:
        labels = jnp.argmax(labels, axis=-1)
    topk = jnp.argsort(logits, axis=-1)[..., -k:]
    return jnp.mean(jnp.any(topk == labels[..., None], axis=-1).astype(jnp.float32))


METRIC_FNS: Dict[str, Callable] = {
    "accuracy": accuracy,
    "top_5_accuracy": lambda l, y: top_k_accuracy(l, y, 5),
}
for _n, _f in METRIC_FNS.items():
    register(f"metric:{_n}", _f)


class MetricAccumulator:
    """Running weighted mean over batches.

    Accumulates DEVICE scalars lazily (jnp adds) — converting to python
    floats forces a host sync per step, which costs ~100ms per dispatch on
    tunneled TPUs; values only materialize in :meth:`compute`.
    """

    def __init__(self):
        self._sums: Dict[str, Any] = {}
        self._count = 0.0

    def update(self, values: Mapping[str, jnp.ndarray], weight: float = 1.0):
        for k, v in values.items():
            cur = self._sums.get(k, 0.0)
            self._sums[k] = cur + (v * weight if hasattr(v, "shape") else float(v) * weight)
        self._count += weight

    def compute(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        return {k: float(v) / self._count for k, v in self._sums.items()}

    def reset(self):
        self._sums.clear()
        self._count = 0.0
