"""Project pipeline registry.

Reference parity: ``deepcv.pipeline.create_pipelines``
(/root/reference/src/deepcv/pipeline.py:29-45) — collects ``get_pipelines()``
from the task packages and exposes ``__default__`` as the union (node timing
is built into the runner, framework.py).

Plugin gating (reference README.md:135 TODO "a mechanism to choose which
pipelines/models/third-party projects ... to enable or not (i.e. optional
plugins to DeepCV) by following Kedro 'modular pipelines' guidelines"):
``create_pipelines(plugins=...)`` takes ``{enabled: [...], disabled: [...],
extra_modules: [...]}`` — task packages are selected by name BEFORE import
(a disabled plugin's dependencies are never loaded), and any external module
exposing ``get_pipelines()`` can join as a third-party plugin. ProjectContext
forwards the ``plugins:`` section of the conf, so a project enables/disables
packages in parameters.yml (or per-run via ``--params plugins.disabled:...``).
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, Mapping, Optional

from deepcv_tpu.pipelines.framework import Pipeline

__all__ = ["create_pipelines", "TASK_PACKAGES"]

#: built-in task packages, in registration order (each is an optional plugin)
TASK_PACKAGES = ("classification", "keypoints", "detection", "pose",
                 "segmentation", "video")


def create_pipelines(plugins: Optional[Mapping[str, Any]] = None
                     ) -> Dict[str, Pipeline]:
    plugins = dict(plugins or {})
    unknown_keys = set(plugins) - {"enabled", "disabled", "extra_modules"}
    if unknown_keys:
        raise ValueError(f"Unknown plugins config key(s) {sorted(unknown_keys)}; "
                         f"expected enabled / disabled / extra_modules")
    enabled = plugins.get("enabled")
    disabled = set(plugins.get("disabled") or ())
    for group in (enabled or (), disabled):
        bad = set(group) - set(TASK_PACKAGES)
        if bad:
            raise ValueError(f"Unknown task package(s) {sorted(bad)}; "
                             f"built-in plugins: {TASK_PACKAGES} "
                             f"(external code goes in extra_modules)")
    selected = [p for p in TASK_PACKAGES
                if (enabled is None or p in enabled) and p not in disabled]
    modules = [importlib.import_module(f"deepcv_tpu.pipelines.{p}")
               for p in selected]
    modules += [importlib.import_module(str(m))
                for m in plugins.get("extra_modules") or ()]

    pipelines: Dict[str, Pipeline] = {}
    for pkg in modules:
        if not hasattr(pkg, "get_pipelines"):
            raise ValueError(f"Plugin module '{pkg.__name__}' has no "
                             f"get_pipelines() (reference pipeline.py:26 "
                             f"contract)")
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
