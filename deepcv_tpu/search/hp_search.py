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
