"""In-process hyperparameter-search runner with jit-cache reuse.

Reference flow (SURVEY §3.5): the NNI dispatcher spawned ONE OS PROCESS per
trial (``kedro run --pipeline=...``), so every trial recompiled everything.
Here trials run in one process:

  * XLA compilations are reused automatically across trials whose jitted
    functions get the same shapes (jax in-memory cache), and
  * a persistent compilation cache directory survives process restarts
    (``jax_compilation_cache_dir``) — BASELINE config #5's multi-trial
    jit-cache-reuse requirement.

Reporting parity: trials receive a :class:`Trial` handle with
``report_intermediate_result`` / ``report_final_result``
(nni.report_* parity, reference ignite_training.py:309-311, 353-356), and the
assessor can early-stop via ``trial.should_stop()``.
"""
from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

from deepcv_tpu.hyperparams import HyperparameterSpace, apply_dotted_overrides
from deepcv_tpu.search.tuners import RandomTuner, TPETuner, MedianStopAssessor

__all__ = ["Trial", "SearchRunner", "enable_persistent_compilation_cache"]

_logger = logging.getLogger(__name__)


def enable_persistent_compilation_cache(cache_dir="data/04_training/jit_cache"):
    """Persist XLA compilations to disk so identical-shape trials (and future
    processes) skip compilation entirely."""
    import jax
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Trial:
    """Handle passed to the trial function."""

    def __init__(self, trial_id: int, params: Dict[str, Any],
                 assessor: Optional[MedianStopAssessor]):
        self.trial_id = trial_id
        self.params = params
        self.intermediates: List[float] = []
        self.final: Optional[float] = None
        self._assessor = assessor
        self.stopped_early = False

    def report_intermediate_result(self, value: float):
        self.intermediates.append(float(value))

    def report_final_result(self, value: float):
        self.final = float(value)

    def should_stop(self) -> bool:
        """Medianstop decision the trial fn may poll per epoch."""
        if self._assessor and self._assessor.should_stop(self.intermediates):
            self.stopped_early = True
            return True
        return False


class SearchRunner:
    """Run ``max_trials`` trials of ``trial_fn(params, trial) -> float|None``.

    ``params`` are the flat dotted-name samples (reference ``model:`` /
    ``training:`` namespacing, nni_tools.py:494-508) — merge them into nested
    hp dicts with :func:`deepcv_tpu.hyperparams.apply_dotted_overrides`.
    """

    def __init__(self, space: HyperparameterSpace, trial_fn: Callable,
                 tuner: str = "tpe", max_trials: int = 20, maximize: bool = True,
                 seed: int = 0, use_assessor: bool = True,
                 output_dir="data/04_training/hp_search",
                 persistent_jit_cache: bool = True):
        self.space = space
        self.trial_fn = trial_fn
        tuner_cls = {"tpe": TPETuner, "random": RandomTuner}.get(tuner)
        if tuner_cls is None:
            from deepcv_tpu.search.tuners import GridTuner
            tuner_cls = {"grid": GridTuner}.get(tuner)
        if tuner_cls is None:
            raise ValueError(f"Unknown tuner '{tuner}' (tpe|random|grid)")
        self.tuner = tuner_cls(space, seed=seed, maximize=maximize)
        self.assessor = MedianStopAssessor(maximize=maximize) if use_assessor else None
        self.max_trials = int(max_trials)
        self.maximize = maximize
        self.output_dir = Path(output_dir)
        if persistent_jit_cache:
            enable_persistent_compilation_cache()

    def run(self) -> Dict[str, Any]:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        results = []
        best = None
        t_start = time.perf_counter()
        for i in range(self.max_trials):
            params = self.tuner.suggest()
            trial = Trial(i, params, self.assessor)
            os.environ["DEEPCV_SEARCH_EXPERIMENT"] = self.output_dir.name
            os.environ["DEEPCV_SEARCH_TRIAL"] = str(i)
            t0 = time.perf_counter()
            try:
                out = self.trial_fn(params, trial)
            except Exception as e:
                _logger.exception("trial %d failed: %s", i, e)
                out = None
            dt = time.perf_counter() - t0
            value = trial.final if trial.final is not None else out
            if value is not None:
                self.tuner.observe(params, float(value))
                if self.assessor:
                    self.assessor.trial_end(trial.intermediates or [float(value)])
            rec = {"trial": i, "params": params, "value": value,
                   "intermediates": trial.intermediates, "seconds": dt,
                   "stopped_early": trial.stopped_early}
            results.append(rec)
            if value is not None and (
                    best is None or
                    (value > best["value"] if self.maximize else value < best["value"])):
                best = rec
            _logger.info("trial %d/%d value=%s (%.1fs)%s", i + 1, self.max_trials,
                         value, dt, " [early-stopped]" if trial.stopped_early else "")
            (self.output_dir / "trials.jsonl").open("a").write(json.dumps(rec) + "\n")
        summary = {"best": best, "trials": results,
                   "total_seconds": time.perf_counter() - t_start}
        (self.output_dir / "summary.json").write_text(json.dumps(summary, indent=1))
        return summary
