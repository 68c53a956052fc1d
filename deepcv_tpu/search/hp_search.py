"""Cheap HP-search trials via generalization-across-scales prediction.

Reference parity: ``deepcv.meta.nni_tools.hp_search`` (nni_tools.py:511-543):
instead of training every candidate configuration on the full dataset, train
it on a handful of SMALL subsets, fit the error-landscape envelope
(arXiv:1909.12673; search.generalization), and report the PREDICTED
full-dataset score to the tuner.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

from deepcv_tpu.data.datasets import get_random_subset
from deepcv_tpu.data.preprocess import PreprocessedDataset
from deepcv_tpu.search.generalization import GeneralizationAcrossScalesPredictor

__all__ = ["scaling_prediction_trial"]

_logger = logging.getLogger(__name__)


def scaling_prediction_trial(model, losses, datasets: Mapping[str, Any],
                             training_hp: Mapping[str, Any],
                             subset_fractions: Sequence[float] = (0.05, 0.1, 0.2,
                                                                  0.3, 0.4, 0.5),
                             metric: str = "valid_accuracy",
                             full_size: Optional[int] = None,
                             backend_conf=None, seed: int = 0,
                             ) -> Dict[str, Any]:
    """Train ``model`` on increasing trainset subsets, fit the envelope,
    predict the full-dataset score.

    Returns {'predicted_error', 'predicted_score', 'observations', 'predictor'}.
    The trial cost is sum(fractions) of one full training (~1.5x epochs of a
    35%-subset run here vs 6 full runs the naive sweep would need).
    """
    trainset = datasets["trainset"]
    inner = getattr(trainset, "dataset", trainset)
    validset = datasets.get("validset", datasets.get("testset"))
    capacity = int(model.capacity()) if hasattr(model, "capacity") else 0
    full_size = int(full_size or len(inner))

    from deepcv_tpu.train import train

    observations = []
    for i, frac in enumerate(subset_fractions):
        sub = get_random_subset(inner, float(frac), seed=seed + i)
        sub_pre = PreprocessedDataset(sub,
                                      transform=getattr(trainset, "transform", None),
                                      target_transform=getattr(trainset,
                                                               "target_transform", None),
                                      augmentation=getattr(trainset,
                                                           "augmentation", None))
        hp = dict(training_hp)
        hp.setdefault("save_every_iters", 0)
        _, hist = train(hp, model, losses,
                        {"trainset": sub_pre, "validset": validset},
                        backend_conf=backend_conf)
        score = hist["valid"][-1].get(metric, 0.0) if hist["valid"] else 0.0
        observations.append({"capacity": float(capacity),
                             "trainset_size": float(len(sub)),
                             "val_error": float(1.0 - score)})
        _logger.info("subset %.0f%% (%d samples): %s=%.4f", 100 * frac,
                     len(sub), metric, score)

    predictor = GeneralizationAcrossScalesPredictor().fit_from_subset_trainings(
        observations)
    predicted_error = predictor.predict(capacity, full_size)
    return {"predicted_error": predicted_error,
            "predicted_score": 1.0 - predicted_error,
            "observations": observations,
            "predictor": predictor}


def hp_search_over_nas(input_shape, model_hp: Mapping[str, Any],
                       training_hp: Mapping[str, Any], losses,
                       datasets: Mapping[str, Any], space, *,
                       algorithm: str = "darts",
                       metric: str = "valid_accuracy", tuner: str = "tpe",
                       max_trials: int = 8, maximize: bool = True,
                       backend_conf=None, metrics=None,
                       output_dir="data/04_training/hp_over_nas",
                       seed: int = 0, **nas_kwargs) -> Dict[str, Any]:
    """HP search where EVERY trial runs a full single-shot NAS training.

    The reference names this composition as an active intent (README.md:144
    "run a NNI HP search which itself performs Single-Shot NNI NAS training
    for each HP trial") but never wired it. Here: the tuner samples
    ``model:`` / ``training:`` dotted overrides, each trial merges them into
    the supernet spec + training hp, runs
    :func:`deepcv_tpu.search.nas.single_shot_neural_architecture_search`
    (darts/spos/proxylessnas/enas), and reports the searched architecture's
    validation ``metric``. So hyperparameters and architecture are searched
    JOINTLY: the tuner learns which hp regions produce good SEARCHED
    architectures, not good fixed ones.

    ``space`` is a :class:`deepcv_tpu.hyperparams.HyperparameterSpace` (or
    an NNI-format JSON path). Returns the SearchRunner summary plus
    ``architectures`` (trial id -> exported arch) and
    ``best['architecture']``.
    """
    from pathlib import Path as _Path

    from deepcv_tpu.hyperparams import (HyperparameterSpace,
                                        apply_dotted_overrides)
    from deepcv_tpu.search.nas import single_shot_neural_architecture_search
    from deepcv_tpu.search.runner import SearchRunner

    if isinstance(space, (str, _Path)):
        space = HyperparameterSpace.from_nni_json(str(space))
    architectures: Dict[int, Dict[str, Any]] = {}

    def trial_fn(params: Mapping[str, Any], trial):
        m_flat = {k: v for k, v in params.items() if k.startswith("model:")}
        t_flat = {k: v for k, v in params.items() if not k.startswith("model:")}
        m_hp = apply_dotted_overrides(dict(model_hp), m_flat)
        t_hp = apply_dotted_overrides(dict(training_hp), t_flat)
        t_hp.setdefault("save_every_iters", 0)
        arch, _state, hist = single_shot_neural_architecture_search(
            input_shape, m_hp, t_hp, losses, datasets,
            backend_conf=backend_conf, algorithm=algorithm, metrics=metrics,
            **nas_kwargs)
        architectures[trial.trial_id] = arch
        for v in hist.get("valid", []):
            trial.report_intermediate_result(float(v.get(metric, 0.0)))
        value = (float(hist["valid"][-1].get(metric, 0.0))
                 if hist.get("valid") else 0.0)
        trial.report_final_result(value)

    summary = SearchRunner(space, trial_fn, tuner=tuner, max_trials=max_trials,
                           maximize=maximize, seed=seed,
                           output_dir=output_dir).run()
    summary["architectures"] = architectures
    if summary.get("best"):
        summary["best"]["architecture"] = architectures.get(
            summary["best"]["trial"])
    return summary
