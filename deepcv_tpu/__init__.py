"""deepcv_tpu — a TPU-native computer-vision framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the DeepCV
reference framework (PaulEmmanuelSotir/DeepCV): YAML-declared model
architectures compiled to pure ``init``/``apply`` functions, batched
on-device data preprocessing & augmentation, a jit-compiled data-parallel
training loop over a ``jax.sharding.Mesh``, hyperparameter & architecture
search, and task pipelines (classification, keypoints, detection, video).

Design stance (vs. the torch/Kedro reference):
  * models are pure functions over parameter pytrees, not stateful Modules;
  * architecture specs are compiled ONCE into a static DAG traced by XLA
    (reference does O(n^2) dummy forwards at build time,
    /root/reference/src/deepcv/meta/nn_spec.py:102-104);
  * data transforms are batched jnp ops running on-chip, not per-item PIL
    calls in DataLoader worker processes;
  * distribution is a Mesh + sharding annotations, not DDP/NCCL process
    groups (/root/reference/src/deepcv/meta/ignite_training.py:373-390).
"""

__version__ = "0.1.0"

from deepcv_tpu import utils  # noqa: F401
from deepcv_tpu.hyperparams import Hyperparameters, to_hyperparameters, merge_hyperparameters  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules on bare
    ``import deepcv_tpu``): DeepcvModule, train, BackendConfig, load_yaml,
    ProjectContext, Predictor, SearchRunner."""
    lazy = {
        "DeepcvModule": ("deepcv_tpu.spec", "DeepcvModule"),
        "train": ("deepcv_tpu.train", "train"),
        "BackendConfig": ("deepcv_tpu.train", "BackendConfig"),
        "load_yaml": ("deepcv_tpu.config", "load_yaml"),
        "ProjectContext": ("deepcv_tpu.pipelines", "ProjectContext"),
        "Predictor": ("deepcv_tpu.serve", "Predictor"),
        "SearchRunner": ("deepcv_tpu.search", "SearchRunner"),
        "LosslessCodec": ("deepcv_tpu.codec", "LosslessCodec"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'deepcv_tpu' has no attribute '{name}'")
