"""Hyperparameter-dict -> fixed-size euclidean embedding.

Reference parity: ``deepcv.meta.hyperparams.HyperparamsEmbedding``
(/root/reference/src/deepcv/meta/hyperparams.py:33-107 — mostly a stub
there): embed a sampled hp configuration into a fixed-size vector so
meta-models (e.g. the generalization predictor's optional NN meta-model) can
condition on hyperparameters.

Working implementation: each domain of a :class:`HyperparameterSpace` encodes
to normalized features (position within its range; one-hot for choices),
then a 3-layer MLP maps the concatenated encoding to ``embedding_size``.
The MLP is a flax module — trainable end-to-end inside any meta-model, or
usable untrained as a random-projection embedding.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as fnn

from deepcv_tpu.hyperparams import HyperparameterSpace, HyperparamDomain

__all__ = ["encode_hp_sample", "HyperparamsEmbedding"]


def encode_hp_sample(space: HyperparameterSpace, sample: Mapping[str, Any]
                     ) -> np.ndarray:
    """Encode one sampled configuration to a flat float vector in [0, 1]."""
    feats = []
    for name, dom in space.domains.items():
        v = sample.get(name)
        if dom.kind == "choice":
            onehot = np.zeros((len(dom.values),), np.float32)
            if v in dom.values:
                onehot[dom.values.index(v)] = 1.0
            feats.append(onehot)
            continue
        lo, hi = float(dom.values[0]), float(dom.values[1])
        if v is None:
            feats.append(np.asarray([0.5], np.float32))
        elif dom.kind == "loguniform":
            t = (math.log(max(float(v), 1e-300)) - math.log(lo)) / \
                max(math.log(hi) - math.log(lo), 1e-12)
            feats.append(np.asarray([np.clip(t, 0, 1)], np.float32))
        else:
            t = (float(v) - lo) / max(hi - lo, 1e-12)
            feats.append(np.asarray([np.clip(t, 0, 1)], np.float32))
    return np.concatenate(feats) if feats else np.zeros((1,), np.float32)


def encoding_size(space: HyperparameterSpace) -> int:
    return sum(len(d.values) if d.kind == "choice" else 1
               for d in space.domains.values()) or 1


class HyperparamsEmbedding(fnn.Module):
    """3-layer MLP over the encoded hp vector (reference intent:
    hyperparams.py:33-107)."""
    embedding_size: int = 32
    hidden_size: int = 64

    @fnn.compact
    def __call__(self, encoded: jnp.ndarray) -> jnp.ndarray:
        x = encoded
        x = jax.nn.relu(fnn.Dense(self.hidden_size, name="fc1")(x))
        x = jax.nn.relu(fnn.Dense(self.hidden_size, name="fc2")(x))
        return fnn.Dense(self.embedding_size, name="fc3")(x)

    @staticmethod
    def embed(space: HyperparameterSpace, samples: Sequence[Mapping[str, Any]],
              embedding_size: int = 32, rng=None):
        """Convenience: encode + random-projection-embed a batch of samples."""
        enc = jnp.asarray(np.stack([encode_hp_sample(space, s) for s in samples]))
        mod = HyperparamsEmbedding(embedding_size=embedding_size)
        variables = mod.init(rng if rng is not None else jax.random.PRNGKey(0), enc)
        return mod.apply(variables, enc), (mod, variables)
