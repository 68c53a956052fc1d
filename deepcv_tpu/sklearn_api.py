"""scikit-learn estimator facade over DeepCV models + fine-tuning tooling.

Reference parity: an explicit README TODO the reference never started —
"implement warpers over DeepCV model pipelines to allow scikit model
interface usage ... + fine-tuning tooling of whole pipelines on small
amount of custom data" (/root/reference/README.md:157).

:class:`DeepcvClassifier` follows the sklearn estimator protocol
(``get_params``/``set_params``/``fit``/``predict``/``predict_proba``/
``score``, ``classes_`` learned label vocabulary) without importing
sklearn — it duck-types, so it drops into sklearn pipelines,
cross-validation and grid search when sklearn is around, and works
standalone when it is not. ``fine_tune`` warm-starts from the fitted
weights on a small dataset, optionally freezing a regex of params
(``hp['freeze_params']`` in the training loop) — classic
train-the-head-only transfer learning.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

__all__ = ["DeepcvClassifier", "DEFAULT_CNN_HP"]

# a compact default CNN for fit() without an explicit architecture: enough
# capacity for small-image tasks, fast to compile anywhere
DEFAULT_CNN_HP: Dict[str, Any] = {
    "act_fn": "relu",
    "batch_norm": {"affine": True, "eps": 1e-5, "momentum": 0.1},
    "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 32, "padding": 1}},
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 32, "padding": 1}},
        {"average_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 64, "padding": 1}},
        {"average_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
        {"flatten": {}},
        {"fully_connected": {"act_fn": None, "batch_norm": None}},
    ],
}


class DeepcvClassifier:
    """sklearn-style image classifier over the spec engine.

    Parameters mirror sklearn conventions (all stored verbatim for
    ``get_params``/clone round-trips):

    * ``model_hp``: a spec dict (``architecture`` + globals). Default:
      :data:`DEFAULT_CNN_HP`. The last ``fully_connected`` gets its
      ``out_features`` sized from the labels seen in ``fit``.
    * ``zoo``/``zoo_kw``: instead of ``model_hp``, build a named zoo family
      (``'resnet18'``-style handled by ``spec/zoo.py`` builders).
    * ``epochs``/``batch_size``/``lr``/``optimizer``/``validset_ratio``/
      ``seed``/``dtype``: the obvious training knobs.
    * ``hp``: extra ``train()`` hyperparameters merged last (escape hatch —
      schedulers, ema_decay, mixup_alpha, ...).
    """

    def __init__(self, model_hp: Optional[Mapping[str, Any]] = None,
                 zoo: Optional[str] = None,
                 zoo_kw: Optional[Mapping[str, Any]] = None,
                 epochs: int = 5, batch_size: int = 64, lr: float = 1e-3,
                 optimizer: str = "adamw", validset_ratio: float = 0.1,
                 seed: int = 0, dtype: Optional[str] = None,
                 hp: Optional[Mapping[str, Any]] = None):
        self.model_hp = model_hp
        self.zoo = zoo
        self.zoo_kw = zoo_kw
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.optimizer = optimizer
        self.validset_ratio = validset_ratio
        self.seed = seed
        self.dtype = dtype
        self.hp = hp

    # ------------------------------------------------- sklearn protocol ----
    _PARAM_NAMES = ("model_hp", "zoo", "zoo_kw", "epochs", "batch_size",
                    "lr", "optimizer", "validset_ratio", "seed", "dtype",
                    "hp")

    def get_params(self, deep: bool = True) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in self._PARAM_NAMES}

    def set_params(self, **params) -> "DeepcvClassifier":
        for k, v in params.items():
            if k not in self._PARAM_NAMES:
                raise ValueError(f"Invalid parameter {k!r} for "
                                 f"DeepcvClassifier (valid: {self._PARAM_NAMES})")
            setattr(self, k, v)
        return self

    # -------------------------------------------------------- internals ----
    def _build_model_hp(self, n_classes: int) -> Dict[str, Any]:
        if self.zoo:
            from deepcv_tpu.spec import zoo as zoo_mod
            builder = getattr(zoo_mod, f"{self.zoo}_spec", None)
            if builder is None:
                raise ValueError(f"unknown zoo family {self.zoo!r}")
            return builder(num_classes=n_classes, **dict(self.zoo_kw or {}))
        from deepcv_tpu.pipelines.classification import _inject_out_features
        hp = copy.deepcopy(dict(self.model_hp or DEFAULT_CNN_HP))
        _inject_out_features(hp["architecture"], n_classes)
        return hp

    def _dataset(self, X, y=None):
        from deepcv_tpu.data.datasets import ArrayDataset
        X = np.asarray(X)
        if X.ndim != 4:
            raise ValueError(f"X must be (N, H, W, C) images, got {X.shape}")
        if y is None:
            return X
        codes = np.searchsorted(self.classes_, np.asarray(y).reshape(-1))
        return ArrayDataset(X, codes.astype(np.int64),
                            classes=[str(c) for c in self.classes_],
                            name="sklearn_fit")

    def _train(self, X, y, *, epochs=None, lr=None, init_variables=None,
               freeze_params=None):
        from deepcv_tpu.data.preprocess import preprocess
        from deepcv_tpu.train import train

        data = preprocess(
            {"trainset": self._dataset(X, y)},
            {"seed": self.seed,
             "split_dataset": {"validset_ratio": float(self.validset_ratio)},
             "transforms": ["to_tensor"]})
        # base defaults < self.hp (user ctor overrides) < EXPLICIT call args
        # (fine_tune's epochs/lr/freeze_params must not be clobbered by hp;
        # None means "no explicit intent" so fit() still honors self.hp)
        hp = {"epochs": int(self.epochs), "batch_size": int(self.batch_size),
              "optimizer": self.optimizer,
              "optimizer_opts": {"lr": float(self.lr)},
              "save_every_iters": 0, "log_progress_every_iters": 1_000_000,
              "seed": self.seed, "dtype": self.dtype,
              "freeze_params": None,
              **dict(self.hp or {})}
        if epochs is not None:
            hp["epochs"] = int(epochs)
        if lr is not None:
            hp["optimizer_opts"] = {**hp.get("optimizer_opts", {}),
                                    "lr": float(lr)}
        if freeze_params is not None:
            hp["freeze_params"] = freeze_params
        state, hist = train(hp, self.model_, "cross_entropy", data,
                            init_variables=init_variables)
        # serve through the SAME transform chain training saw
        self._batch_transform = data["trainset"].batch_transform
        self.variables_ = {k: v for k, v in
                           (("params", state.params),
                            ("batch_stats", state.batch_stats)) if v is not None}
        if state.ema_params is not None and hp.get("ema_eval", True):
            self.variables_ = dict(self.variables_, params=state.ema_params)
        self.history_ = hist
        self._predictor = None
        return self

    # ---------------------------------------------------------- fitting ----
    def fit(self, X, y) -> "DeepcvClassifier":
        X = np.asarray(X)
        self.classes_ = np.unique(np.asarray(y).reshape(-1))
        if len(self.classes_) < 2:
            raise ValueError("fit needs at least 2 classes")
        from deepcv_tpu.spec import DeepcvModule
        model_hp = self._build_model_hp(len(self.classes_))
        self.model_ = DeepcvModule(tuple(X.shape[1:]), model_hp,
                                   dtype=self.dtype)
        return self._train(X, y)

    def fine_tune(self, X, y, *, epochs: int = 2, lr: Optional[float] = None,
                  freeze_params: Optional[str] = None) -> "DeepcvClassifier":
        """Continue training the fitted model on (small) new data — the
        reference TODO's "fine-tuning ... on small amount of custom data".
        ``freeze_params``: regex over param paths to freeze (e.g.
        ``'^(?!.*fully_connected)'`` trains only the classifier head).
        Labels must come from the fitted ``classes_`` vocabulary."""
        self._check_fitted()
        unseen = set(np.unique(np.asarray(y).reshape(-1))) - set(self.classes_)
        if unseen:
            raise ValueError(f"fine_tune labels not in classes_: {unseen}")
        return self._train(X, y, epochs=epochs,
                           lr=float(lr if lr is not None else self.lr * 0.1),
                           init_variables=self.variables_,
                           freeze_params=freeze_params)

    # -------------------------------------------------------- inference ----
    def _check_fitted(self):
        if not hasattr(self, "variables_"):
            raise RuntimeError("This DeepcvClassifier instance is not fitted "
                               "yet; call fit(X, y) first")

    def predict_proba(self, X) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        self._check_fitted()
        if self._predictor is None:
            from deepcv_tpu.serve import Predictor
            self._predictor = Predictor(self.model_, self.variables_,
                                        batch_size=int(self.batch_size),
                                        preprocess=self._batch_transform)
        logits = self._predictor(self._dataset(X))
        return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

    def predict(self, X) -> np.ndarray:
        proba = self.predict_proba(X)      # _check_fitted runs inside
        return self.classes_[proba.argmax(axis=1)]

    def score(self, X, y) -> float:
        return float(np.mean(self.predict(X) == np.asarray(y).reshape(-1)))
