"""Mesh/sharding helpers — the framework's parallelism toolbox.

Reference parallelism inventory (SURVEY §2.9): data parallel (DataParallel/
DDP), sync batch norm, and logical HRNet branches; no TP/PP/SP/EP. The
TPU-native mapping (train/backend.py) covers DP + sync-BN through GSPMD.
This module adds the pieces a *framework* should expose beyond parity:

  * :func:`make_mesh` — build an N-d device mesh by axis sizes;
  * :func:`tensor_parallel_rules` / :func:`shard_params` — simple
    Megatron-style tensor parallelism for Dense/Conv kernels over a 'model'
    axis (column-parallel on the output-features dim): XLA inserts the
    matching collectives, so annotating params is ALL that is needed;
  * :func:`cross_replica_mean` — explicit-collective helper for
    shard_map-style code;
  * :func:`data_parallelism_usefulness_heuristic` — reference
    ``is_data_parallelization_usefull_heuristic`` parity (nn.py:618-637):
    sigmoid score over model capacity / batch size / device count, used to
    advise whether multi-chip DP is worth it for tiny models.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "tensor_parallel_rules", "shard_params",
           "cross_replica_mean", "data_parallelism_usefulness_heuristic"]


def make_mesh(axis_sizes: Mapping[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh from {axis_name: size}; sizes must multiply to the device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(int(s) for s in axis_sizes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"axis sizes {dict(axis_sizes)} do not multiply to "
                         f"{len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_sizes))


def tensor_parallel_rules(params, mesh: Mesh, model_axis: str = "model",
                          min_features: int = 2) -> Any:
    """PartitionSpec pytree: shard the OUTPUT-features dim of every kernel
    over ``model_axis`` when divisible (column-parallel linear/conv); biases
    and everything else replicated.

    With params so sharded and activations unsharded on features, XLA
    all-gathers outputs exactly where needed — Megatron behavior without any
    manual collective.
    """
    axis_size = mesh.shape[model_axis]

    def rule(path, leaf):
        last = str(getattr(path[-1], "key", path[-1])) if path else ""
        if last == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[-1] % axis_size == 0 \
                and leaf.shape[-1] // axis_size >= min_features:
            return P(*([None] * (leaf.ndim - 1)), model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, rules=None, model_axis: str = "model"):
    """Place a param pytree onto the mesh per the TP rules (or replicated)."""
    if rules is None:
        rules = tensor_parallel_rules(params, mesh, model_axis)
    return jax.tree_util.tree_map(
        lambda w, spec: jax.device_put(w, NamedSharding(mesh, spec)),
        params, rules)


def cross_replica_mean(tree, axis_name: str = "data"):
    """pmean over a named axis — for shard_map/pmap-style code (the explicit
    SyncBatchNorm collective, reference ignite_training.py:382-386)."""
    return jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis_name), tree)


def data_parallelism_usefulness_heuristic(model_capacity: int, batch_size: int,
                                          n_devices: Optional[int] = None) -> float:
    """Score in [0, 1]: is splitting this workload over more chips useful?

    Reference ``is_data_parallelization_usefull_heuristic`` (nn.py:608-637)
    scored DataParallel worthiness by capacity/batch/ngpus sigmoids; same
    shape here with TPU-scaled constants (per-chip batch below ~64 or models
    under ~1M params leave chips idle).
    """
    n_devices = n_devices if n_devices is not None else len(jax.devices())
    if n_devices <= 1:
        return 0.0

    def sig(x):
        return 1.0 / (1.0 + math.exp(-x))

    capacity_score = sig((math.log10(max(model_capacity, 1)) - 6.0) * 2.0)
    per_chip = batch_size / n_devices
    batch_score = sig((per_chip - 64.0) / 32.0)
    return float(0.5 * capacity_score + 0.5 * batch_score)
