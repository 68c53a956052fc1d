"""Shared type aliases (L1 layer parity:
/root/reference/src/deepcv/meta/types_aliases.py:27-59 — torch-typed aliases
remapped to their JAX equivalents)."""
from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import numpy as np

__all__ = [
    "TENSOR_T", "TENSOR_OR_SEQ_OF_TENSORS_T", "PARAMS_T", "VARIABLES_T",
    "HYPERPARAMS_T", "LOSS_FN_T", "METRIC_FN_T", "ACT_FN_T",
    "SUBMODULE_CREATORS_DICT_T", "MODULE_OR_CALLBACK_T", "DATASET_T",
    "PATH_T", "SEED_T", "SCHEDULE_T", "PYTREE_T",
]

#: a device array (reference: torch.Tensor)
TENSOR_T = jax.Array

#: single tensor or a parallel-stream list (HRNet) — reference
#: TENSOR_OR_SEQ_OF_TENSORS_T
TENSOR_OR_SEQ_OF_TENSORS_T = Union[jax.Array, Sequence[jax.Array]]

#: parameter pytree ('params' collection)
PARAMS_T = Mapping[str, Any]

#: full variables dict {'params': ..., 'batch_stats': ...}
VARIABLES_T = Mapping[str, Any]

#: hyperparameter mapping (dict or deepcv_tpu.hyperparams.Hyperparameters)
HYPERPARAMS_T = Mapping[str, Any]

#: loss(logits, targets) -> scalar
LOSS_FN_T = Callable[..., jax.Array]

#: metric(logits, targets) -> scalar
METRIC_FN_T = Callable[[jax.Array, jax.Array], jax.Array]

#: activation function
ACT_FN_T = Callable[[jax.Array], jax.Array]

#: creator-name -> creator entry (reference SUBMODULE_CREATORS_DICT_T)
SUBMODULE_CREATORS_DICT_T = Dict[str, Dict[str, Any]]

#: graph node implementation: flax module or ForwardCallback
MODULE_OR_CALLBACK_T = Any

#: any array-backed dataset
DATASET_T = Any

PATH_T = Union[str, Path]
SEED_T = Union[int, jax.Array]
SCHEDULE_T = Callable[[jax.Array], jax.Array]
PYTREE_T = Any
