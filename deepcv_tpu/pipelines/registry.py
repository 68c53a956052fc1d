"""Project pipeline registry.

Reference parity: ``deepcv.pipeline.create_pipelines``
(/root/reference/src/deepcv/pipeline.py:29-45) — collects ``get_pipelines()``
from the task packages and exposes ``__default__`` as the union (node timing
is built into the runner, framework.py).
"""
from __future__ import annotations

from typing import Dict

from deepcv_tpu.pipelines.framework import Pipeline

__all__ = ["create_pipelines"]


def create_pipelines() -> Dict[str, Pipeline]:
    from deepcv_tpu.pipelines import (classification, keypoints, detection,
                                      pose, segmentation, video)

    pipelines: Dict[str, Pipeline] = {}
    for pkg in (classification, keypoints, detection, pose, segmentation,
                video):
        for name, p in pkg.get_pipelines().items():
            if name in pipelines:
                raise ValueError(f"Duplicate pipeline name '{name}'")
            pipelines[name] = p
    default = None
    for p in pipelines.values():
        default = p if default is None else default + p
    if default is not None:
        default.name = "__default__"
        pipelines["__default__"] = default
    return pipelines
