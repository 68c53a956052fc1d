"""Uncertainty-driven active learning.

The working take on two reference intents that never got past the TODO
list: "exploit estimated uncertainty to perform a kind of active
learning" (/root/reference/README.md:152, the empty
``meta/uncertainty_WIP`` package) and "more tools for faster deep
learning model convergence ... thanks to active learning"
(/root/reference/README.md:173).

Protocol (pool-based active learning, the standard simulation): a
labeled *pool* plays the role of an unlabeled corpus; the loop starts
from a small seeded labeled subset, trains, scores the remaining pool
with an MC-dropout acquisition function, "reveals" the labels of the
top-k most informative samples, and repeats. Every round's validation
metrics are recorded, so the value of uncertainty-driven labeling over
random labeling is measurable on the same budget.

TPU notes: pool scoring is ONE compiled forward per MC sample, batched
over pool chunks (padding the ragged tail so a single XLA program
serves every chunk); acquisition math is a cheap host-side reduction
over the (samples, pool, classes) stack.
"""

from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ACQUISITION_FNS", "register_acquisition", "acquisition_scores",
           "mc_class_probabilities", "active_learning_loop"]

_EPS = 1e-12

ACQUISITION_FNS: Dict[str, Callable] = {}


def register_acquisition(name: str):
    """Register ``fn(probs: (S, N, C) ndarray, rng) -> (N,) scores``
    (higher = more informative = acquired first)."""
    def dec(fn):
        ACQUISITION_FNS[name] = fn
        return fn
    return dec


def _entropy(p: np.ndarray) -> np.ndarray:
    return -np.sum(p * np.log(p + _EPS), axis=-1)


@register_acquisition("entropy")
def _acq_entropy(probs: np.ndarray, rng) -> np.ndarray:
    """Predictive entropy H[E_s p_s] — total uncertainty."""
    return _entropy(probs.mean(axis=0))


@register_acquisition("bald")
def _acq_bald(probs: np.ndarray, rng) -> np.ndarray:
    """BALD mutual information I[y; params] = H[E_s p_s] - E_s H[p_s]
    (Houlsby et al., arXiv:1112.5745) — EPISTEMIC uncertainty only.
    Models without dropout give identical MC samples, hence 0 everywhere;
    prefer 'entropy' for those."""
    return _entropy(probs.mean(axis=0)) - _entropy(probs).mean(axis=0)


@register_acquisition("margin")
def _acq_margin(probs: np.ndarray, rng) -> np.ndarray:
    """1 - (top1 - top2) of the mean prediction — boundary proximity."""
    top2 = np.sort(probs.mean(axis=0), axis=-1)[..., -2:]
    return 1.0 - (top2[..., 1] - top2[..., 0])


@register_acquisition("variation_ratio")
def _acq_variation_ratio(probs: np.ndarray, rng) -> np.ndarray:
    """1 - max_c E_s p_s — confidence complement."""
    return 1.0 - probs.mean(axis=0).max(axis=-1)


@register_acquisition("random")
def _acq_random(probs: np.ndarray, rng) -> np.ndarray:
    """Uniform-random scores — the control arm every AL claim needs."""
    return rng.random(probs.shape[1])


def acquisition_scores(probs: np.ndarray, acquisition: str,
                       rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Score a pool from its MC probability stack ``(S, N, C)``."""
    if acquisition not in ACQUISITION_FNS:
        raise ValueError(f"unknown acquisition {acquisition!r} "
                         f"(have {sorted(ACQUISITION_FNS)})")
    return np.asarray(ACQUISITION_FNS[acquisition](
        np.asarray(probs), rng or np.random.default_rng(0)))


def mc_class_probabilities(model, variables, pool, indices: np.ndarray, *,
                           n_samples: int = 8, batch_size: int = 64,
                           seed: int = 0) -> np.ndarray:
    """MC-dropout class probabilities over ``pool.dataset.images[indices]``.

    Returns ``(n_samples, len(indices), n_classes)`` float32. One jitted
    program: ``pool.batch_transform`` (no augmentation) -> train-mode apply
    (dropout live, batch-stat updates DISCARDED — same compromise as
    ``Predictor.predict_with_uncertainty``, serve.py) -> softmax.
    """
    def fwd(variables, raw, key):
        x = pool.batch_transform(raw, augment=False)
        mut = [c for c in ("batch_stats",) if c in variables]
        out = model.apply(variables, x, train=True, rngs={"dropout": key},
                          mutable=mut if mut else False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    jfwd = jax.jit(fwd)
    images = pool.dataset.images
    n = len(indices)
    bs = min(batch_size, max(1, n))
    samples = []
    for s in range(n_samples):
        key = jax.random.PRNGKey(seed * 1000 + s)
        outs = []
        for start in range(0, n, bs):
            chunk_idx = indices[start:start + bs]
            raw = np.stack([np.asarray(images[i]) for i in chunk_idx])
            pad = bs - len(raw)
            if pad:
                # tile the last REAL row — zero pads would skew the
                # train-mode BatchNorm statistics of the real rows
                raw = np.concatenate([raw, np.repeat(raw[-1:], pad, axis=0)])
            p = jfwd(variables, jnp.asarray(raw), key)
            outs.append(np.asarray(p)[:bs - pad if pad else bs])
        samples.append(np.concatenate(outs))
    return np.stack(samples)


def _labeled_view(pool, indices: np.ndarray, name: str):
    """A PreprocessedDataset over a pool index subset, sharing the pool's
    fitted transforms (normalization stats stay those of the FULL pool —
    refitting per round would leak budget-dependent statistics)."""
    from deepcv_tpu.data.preprocess import PreprocessedDataset
    return PreprocessedDataset(pool.dataset.subset(np.asarray(indices), name=name),
                               transform=pool.transform,
                               target_transform=pool.target_transform,
                               augmentation=pool.augmentation)


def active_learning_loop(input_shape, model_hp: Mapping[str, Any],
                         training_hp: Mapping[str, Any], losses,
                         datasets: Mapping[str, Any], *,
                         rounds: int = 4, acquire_per_round: int = 16,
                         init_labeled=16, acquisition: str = "bald",
                         n_mc: int = 8, metric: str = "valid_accuracy",
                         backend_conf=None, metrics=None, seed: int = 0,
                         score_batch_size: int = 64) -> Dict[str, Any]:
    """Pool-based active learning: (train -> score pool -> acquire) x rounds.

    ``datasets``: ``{'poolset': PreprocessedDataset, 'validset': ...}`` —
    the pool's labels are hidden until acquisition reveals them.
    ``init_labeled``: int (seeded uniform draw) or explicit index array.
    Each round retrains FROM SCRATCH on the labeled set (the standard
    protocol — warm-starting biases toward early acquisitions).

    Returns ``{'rounds': [{'round', 'n_labeled', metric..., 'acquired'}],
    'labeled_indices', 'model', 'state', 'history'}`` where ``acquired``
    is the index batch selected AFTER that round's training.
    """
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train.training import train

    if acquisition not in ACQUISITION_FNS:   # fail before the first training
        raise ValueError(f"unknown acquisition {acquisition!r} "
                         f"(have {sorted(ACQUISITION_FNS)})")
    pool = datasets["poolset"]
    validset = datasets["validset"]
    rng = np.random.default_rng(seed)
    n_pool = len(pool)
    if isinstance(init_labeled, (int, np.integer)):
        labeled = rng.choice(n_pool, size=min(int(init_labeled), n_pool),
                             replace=False)
    else:
        labeled = np.unique(np.asarray(init_labeled, dtype=np.int64))
    labeled = np.sort(labeled)

    out_rounds = []
    model = state = history = None
    for r in range(int(rounds)):
        model = DeepcvModule(input_shape, model_hp)
        hp = dict(training_hp)
        hp.setdefault("save_every_iters", 0)
        if hp.get("output_path"):
            hp["output_path"] = f"{hp['output_path']}/al_round_{r}"
        # same model-init/shuffle seed every round: accuracy changes reflect
        # the DATA acquired, not a reshuffled lottery ticket
        hp.setdefault("seed", seed)
        state, history = train(
            hp, model, losses,
            {"trainset": _labeled_view(pool, labeled, f"al_labeled_r{r}"),
             "validset": validset},
            backend_conf=backend_conf, metrics=metrics)
        entry = {"round": r, "n_labeled": int(len(labeled)), "acquired": []}
        if history.get("valid"):
            entry.update({k: v for k, v in history["valid"][-1].items()
                          if k != "epoch"})
        remaining = np.setdiff1d(np.arange(n_pool), labeled)
        if r < rounds - 1 and len(remaining) and acquire_per_round > 0:
            probs = mc_class_probabilities(
                model, state.variables(), pool, remaining, n_samples=int(n_mc),
                batch_size=score_batch_size, seed=seed + r)
            scores = acquisition_scores(probs, acquisition, rng)
            k = min(int(acquire_per_round), len(remaining))
            picked = remaining[np.argsort(scores)[::-1][:k]]
            entry["acquired"] = [int(i) for i in picked]
            labeled = np.sort(np.concatenate([labeled, picked]))
        out_rounds.append(entry)
    return {"rounds": out_rounds, "labeled_indices": labeled,
            "model": model, "state": state, "history": history,
            "final": {metric: out_rounds[-1].get(metric)}}


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
