"""Learning-rate range test (fastai-style LR finder).

Reference parity: ``deepcv.meta.one_cycle`` planned
``run_param_search`` / ``find_optimal_params`` / ``plot_search_curves``
(/root/reference/src/deepcv/meta/one_cycle.py:21-51 — NotImplementedError
stubs there). Working implementation: exponential LR sweep over a few hundred
steps on the real train step, exponentially-smoothed loss, divergence
cutoff; suggests (base_lr, max_lr) for the one-cycle policy.
"""
from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepcv_tpu.data.preprocess import PreprocessedDataset
from deepcv_tpu.data.pipeline import BatchIterator, prefetch_to_device
from deepcv_tpu.train.losses import WeightedLosses

__all__ = ["run_lr_range_test", "find_optimal_params", "plot_search_curves"]

_logger = logging.getLogger(__name__)


def run_lr_range_test(model, losses, trainset, batch_size: int = 64,
                      min_lr: float = 1e-7, max_lr: float = 10.0,
                      num_steps: int = 100, smoothing: float = 0.98,
                      divergence_factor: float = 4.0, seed: int = 0,
                      ) -> Dict[str, Any]:
    """Sweep LR exponentially from min_lr to max_lr; returns
    {'lrs', 'losses', 'smoothed', 'best_lr', 'suggested': {...}}."""
    if not isinstance(losses, WeightedLosses):
        losses = WeightedLosses(losses)
    ds = trainset if isinstance(trainset, PreprocessedDataset) \
        else PreprocessedDataset(trainset)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng)
    params = variables["params"]
    bstats = variables.get("batch_stats")

    gamma = (max_lr / min_lr) ** (1.0 / max(1, num_steps - 1))
    lr_schedule = lambda count: min_lr * gamma ** count
    tx = optax.sgd(lr_schedule, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, bs, x, y, key):
        xb = ds.batch_transform(x, key=key)
        variables = {"params": p}
        if bs is not None:
            variables["batch_stats"] = bs
        out = model.apply(variables, xb, train=True, rngs={"dropout": key},
                          mutable=["batch_stats"] if bs is not None else False)
        logits, st = out if isinstance(out, tuple) else (out, {})
        main, _ = losses(logits, y)
        return main, st.get("batch_stats")

    @jax.jit
    def step(p, bs, opt_state, x, y, key):
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, y, key)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    it = BatchIterator(ds, batch_size, shuffle=True, seed=seed)
    lrs, raw, smoothed = [], [], []
    avg, best = 0.0, float("inf")
    i = 0
    while i < num_steps:
        for x, y in it.epoch(i // max(1, len(it))):
            if i >= num_steps:
                break
            key = jax.random.fold_in(rng, i)
            params, bstats, opt_state, loss = step(params, bstats, opt_state,
                                                   jnp.asarray(x), jnp.asarray(y), key)
            lv = float(loss)
            lrs.append(float(lr_schedule(i)))
            raw.append(lv)
            avg = smoothing * avg + (1 - smoothing) * lv
            sm = avg / (1 - smoothing ** (i + 1))
            smoothed.append(sm)
            best = min(best, sm)
            i += 1
            if not math.isfinite(lv) or sm > divergence_factor * best:
                _logger.info("LR range test diverged at lr=%.2e (step %d)",
                             lrs[-1], i)
                i = num_steps
                break
    out = {"lrs": lrs, "losses": raw, "smoothed": smoothed}
    out.update(find_optimal_params(lrs, smoothed))
    return out


def find_optimal_params(lrs: Sequence[float], smoothed: Sequence[float]
                        ) -> Dict[str, Any]:
    """Pick the steepest-descent LR; suggest one-cycle (base_lr, max_lr)
    (reference find_optimal_params stub, one_cycle.py)."""
    lrs = np.asarray(lrs)
    sm = np.asarray(smoothed)
    if len(lrs) < 5:
        return {"best_lr": float(lrs[-1]) if len(lrs) else 1e-3,
                "suggested": {"base_lr": 1e-4, "max_lr": 1e-3}}
    grad = np.gradient(sm, np.log10(np.maximum(lrs, 1e-12)))
    lo = max(1, len(lrs) // 20)
    steepest = int(np.argmin(grad[lo:len(lrs) - 1])) + lo
    best_lr = float(lrs[steepest])
    return {"best_lr": best_lr,
            "suggested": {"base_lr": best_lr / 25.0, "max_lr": best_lr}}


def plot_search_curves(result: Mapping[str, Any], path="lr_range_test.png"):
    """Save the LR-vs-loss curve (matplotlib when available, else CSV)
    (reference plot_search_curves stub)."""
    path = Path(path)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(result["lrs"], result["smoothed"], label="smoothed loss")
        ax.set_xscale("log")
        ax.axvline(result["best_lr"], color="r", ls="--",
                   label=f"best lr {result['best_lr']:.2e}")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("loss")
        ax.legend()
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        return path
    except ImportError:
        csv = path.with_suffix(".csv")
        with csv.open("w") as f:
            f.write("lr,loss,smoothed\n")
            for l, r, s in zip(result["lrs"], result["losses"], result["smoothed"]):
                f.write(f"{l},{r},{s}\n")
        return csv
