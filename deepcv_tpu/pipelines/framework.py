"""Minimal pipeline orchestration (the Kedro-equivalent shell).

Reference parity:
  * ``kedro.pipeline.Pipeline``/``node`` graphs of task functions over a data
    catalog (reference classification/image.py:28-37 style) -> :class:`Node`,
    :class:`Pipeline`;
  * ``ProjectContext`` (run.py:27-64): conf loading, catalog, pipeline
    registry, run lifecycle with hooks;
  * ``ProjectMainHooks`` mlflow wiring (hooks.py:37-129) -> experiment
    tracker started before 'train'-tagged pipelines, git/pipeline metadata
    tags, closed on success/error;
  * per-node ``log_time`` decoration (pipeline.py:24,43) -> built into the
    runner.

Catalog entries are dataset specs resolved through
``deepcv_tpu.data.datasets.load_dataset``; parameters are exposed to node
inputs as ``params:<dotted.path>`` (Kedro convention).
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Mapping, Optional, Sequence, Union

from deepcv_tpu.config import ConfigLoader
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.train.loggers import ExperimentTracker, git_metadata

__all__ = ["Node", "Pipeline", "ProjectContext"]

_logger = logging.getLogger(__name__)


def append_dense_head(hp: dict, name: str, out_channels: int, size) -> dict:
    """Append the dense-prediction head rows the pixel-level tasks share:
    a norm-free 1x1 conv to ``out_channels`` + bilinear resize to ``size``
    (segmentation class maps, pose heatmaps). One copy of the
    norm-suppression set — a new global norm technique added to the spec
    language only needs updating here."""
    hp["architecture"].extend([
        {"conv2d": [name, {"kernel_size": [1, 1],
                           "out_channels": int(out_channels), "padding": 0,
                           "act_fn": None,
                           **{t: None for t in
                              ("batch_norm", "group_norm", "layer_norm",
                               "layer_nrm_and_mean_batch_nrm")}}]},
        {"interpolate": {"size": [int(v) for v in size]}},
    ])
    return hp


def preprocess_node(trainset, testset, params):
    """Shared preprocess node adapter used by every task package's pipeline
    registry: catalog datasets -> data.preprocess.preprocess({'trainset',
    'testset'}, params) (one definition instead of a copy per task module)."""
    from deepcv_tpu.data.preprocess import preprocess as preprocess_fn
    return preprocess_fn({"trainset": trainset, "testset": testset}, params)


class Node:
    """One pipeline step: ``fn(*inputs) -> outputs``.

    ``inputs`` name catalog entries, prior node outputs, or ``params:...``
    parameter paths. ``outputs`` are names bound into the run's data store.
    """

    def __init__(self, fn: Callable, inputs: Sequence[str], outputs: Union[str, Sequence[str]],
                 name: Optional[str] = None, tags: Sequence[str] = ()):
        self.fn = fn
        self.inputs = list(inputs)
        self.outputs = [outputs] if isinstance(outputs, str) else list(outputs or [])
        self.name = name or getattr(fn, "__name__", "node")
        self.tags = set(tags)

    def __repr__(self):
        return f"Node({self.name}: {self.inputs} -> {self.outputs})"


class Pipeline:
    """An ordered list of nodes with tags (execution is sequential in input
    order — sufficient for the reference's linear pipelines; nodes only read
    what earlier nodes or the catalog provide)."""

    def __init__(self, nodes: Sequence[Node], name: str = "pipeline",
                 tags: Sequence[str] = ()):
        self.nodes = list(nodes)
        self.name = name
        self.tags = set(tags)

    def __add__(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self.nodes + other.nodes, name=f"{self.name}+{other.name}",
                        tags=self.tags | other.tags)

    def __repr__(self):
        return f"Pipeline({self.name}, nodes={[n.name for n in self.nodes]})"

    def describe(self) -> str:
        lines = [f"Pipeline '{self.name}' (tags: {sorted(self.tags)})"]
        for n in self.nodes:
            lines.append(f"  {n.name}: {n.inputs} -> {n.outputs}")
        return "\n".join(lines)

    def filter(self, from_nodes: Sequence[str] = (), to_nodes: Sequence[str] = (),
               only_nodes: Sequence[str] = (), tags: Sequence[str] = ()
               ) -> "Pipeline":
        """Sub-pipeline selection (reference ``kedro run --from-nodes /
        --to-nodes / --node / --tag``, kedro_cli.py:157-231).

        Sequential semantics (pipelines here are ordered lists): from_nodes
        cuts everything before the FIRST named node, to_nodes everything
        after the LAST named node, only_nodes keeps exactly the named nodes,
        tags keeps nodes carrying any of the given tags. Filters compose.
        Unknown node names raise.
        """
        names = [n.name for n in self.nodes]
        for ref in (*from_nodes, *to_nodes, *only_nodes):
            if ref not in names:
                raise KeyError(f"Pipeline '{self.name}' has no node '{ref}'; "
                               f"nodes: {names}")
        keep = self.nodes
        if from_nodes:
            start = min(names.index(r) for r in from_nodes)
            keep = [n for n in keep if names.index(n.name) >= start]
        if to_nodes:
            stop = max(names.index(r) for r in to_nodes)
            keep = [n for n in keep if names.index(n.name) <= stop]
        if only_nodes:
            keep = [n for n in keep if n.name in only_nodes]
        if tags:
            keep = [n for n in keep if n.tags & set(tags)]
        if not keep:
            raise ValueError(
                f"Node selection left pipeline '{self.name}' empty "
                f"(from={list(from_nodes)}, to={list(to_nodes)}, "
                f"only={list(only_nodes)}, tags={list(tags)})")
        return Pipeline(keep, name=self.name, tags=self.tags)


class ProjectContext:
    """Loads conf, resolves the catalog, registers pipelines, runs them.

    Reference ``ProjectContext`` (run.py:27-64) + hooks (hooks.py). The unsafe
    anyconfig/ruamel monkey-patch (run.py:44-46) is replaced by the safe
    config loader.
    """

    def __init__(self, project_path: Union[str, Path] = ".",
                 conf_paths: Optional[Sequence[Union[str, Path]]] = None,
                 extra_params: Optional[Mapping[str, Any]] = None):
        self.project_path = Path(project_path)
        conf_paths = conf_paths or [self.project_path / "conf" / "base",
                                    self.project_path / "conf" / "local"]
        self.config = ConfigLoader(conf_paths)
        self._extra_params = dict(extra_params or {})
        self._pipelines: Optional[Dict[str, Pipeline]] = None
        self._tracker: Optional[ExperimentTracker] = None
        self._persist_dir: Optional[Path] = None
        self._persist_names: set = set()

    # ------------------------------------------------------------ pipelines
    @property
    def pipelines(self) -> Dict[str, Pipeline]:
        if self._pipelines is None:
            from deepcv_tpu.pipelines.registry import create_pipelines
            # plugins: section of the conf gates task packages / adds
            # third-party plugin modules (reference README.md:135 TODO);
            # `--params plugins.disabled:...` overrides per run
            self._pipelines = create_pipelines(self.params("plugins", None))
        return self._pipelines

    # ------------------------------------------------------------ parameters
    def params(self, dotted: str, default=None):
        if dotted in self._extra_params:
            return self._extra_params[dotted]
        v = self.config.get(dotted, default)
        # apply extra-param dotted overrides below this path
        if isinstance(v, Mapping):
            from deepcv_tpu.hyperparams import apply_dotted_overrides
            overrides = {k[len(dotted) + 1:]: val for k, val in self._extra_params.items()
                         if k.startswith(dotted + ".")}
            if overrides:
                v = apply_dotted_overrides(dict(v), overrides, strip_prefixes=())
        return v

    # ------------------------------------------------------------ catalog
    def load_catalog_entry(self, name: str):
        entry = self.config.catalog.get(name)
        if entry is None:
            raise KeyError(f"Catalog entry '{name}' not found; known: "
                           f"{sorted(self.config.catalog)}")
        return load_dataset(entry, root=entry.get("root", "data/01_raw"),
                            train=bool(entry.get("train", True)))

    # ------------------------------------------------------------ running
    def intermediate_dir(self, pipeline_name: str) -> Path:
        return self.project_path / "data" / "02_intermediate" / pipeline_name

    def run(self, pipeline_name: str = "__default__",
            loggers: Sequence[Any] = (),
            from_nodes: Sequence[str] = (), to_nodes: Sequence[str] = (),
            only_nodes: Sequence[str] = (), tags: Sequence[str] = (),
            persist_intermediates: bool = True) -> Dict[str, Any]:
        """Execute a pipeline (or a node selection of it); returns the final
        data store.

        Partial runs (reference ``kedro run --from-nodes/--to-nodes/--node/
        --tag``, kedro_cli.py:157-231): node outputs are persisted under
        ``data/02_intermediate/<pipeline>/`` after each run (pickle; skipped
        with a log when an output is not serializable), and a later partial
        run resolves missing inputs from there — so ``from_nodes=['train']``
        starts from the cached ``preprocess`` output instead of recomputing
        it. ``persist_intermediates=False`` disables both the writes and the
        fallback reads.
        """
        pipes = self.pipelines
        if pipeline_name not in pipes:
            raise KeyError(f"Unknown pipeline '{pipeline_name}'; known: "
                           f"{sorted(pipes)}")
        pipeline = pipes[pipeline_name]
        # persist only outputs some node of the FULL pipeline consumes as an
        # input — that is what a later partial run can need; terminal outputs
        # (train_results with a full model state, ...) would only burn disk
        self._persist_names = {i for n in pipeline.nodes for i in n.inputs}
        if from_nodes or to_nodes or only_nodes or tags:
            pipeline = pipeline.filter(from_nodes=from_nodes, to_nodes=to_nodes,
                                       only_nodes=only_nodes, tags=tags)
            _logger.info("partial run: nodes %s", [n.name for n in pipeline.nodes])
        self._persist_dir = (self.intermediate_dir(pipeline_name)
                             if persist_intermediates else None)

        # hooks: experiment tracking for train-tagged pipelines
        # (reference hooks.py:37-129)
        tracker = None
        if "train" in pipeline.tags:
            run_name = self._search_trial_run_name() or pipeline.name
            tracker = ExperimentTracker(experiment=pipeline.name, run_name=run_name)
            tracker.set_tags({**git_metadata(str(self.project_path)),
                              "pipeline": pipeline.name})
            tracker.log_params({"pipeline_nodes": [n.name for n in pipeline.nodes]})
            self._tracker = tracker

        store: Dict[str, Any] = {"context": self, "trackers": [tracker] if tracker else []}
        status = "FINISHED"
        try:
            for node in pipeline.nodes:
                args = [self._resolve_input(i, store) for i in node.inputs]
                t0 = time.perf_counter()
                out = node.fn(*args)
                _logger.info("node %s took %.2fs", node.name,
                             time.perf_counter() - t0)  # log_time parity
                if len(node.outputs) == 1:
                    store[node.outputs[0]] = out
                    self._persist_output(node.outputs[0], out)
                elif node.outputs:
                    for oname, oval in zip(node.outputs, out):
                        store[oname] = oval
                        self._persist_output(oname, oval)
            return store
        except Exception:
            status = "FAILED"
            raise
        finally:
            if tracker:
                tracker.end_run(status)

    def _persist_output(self, name: str, value: Any) -> None:
        if self._persist_dir is None or name not in self._persist_names:
            return
        import os
        import pickle
        path = self._persist_dir / f"{name}.pkl"
        # pid-unique tmp: concurrent runs/trials must not race on one name
        tmp = path.with_suffix(f".pkl.{os.getpid()}.tmp")
        try:
            self._persist_dir.mkdir(parents=True, exist_ok=True)
            with open(tmp, "wb") as f:
                pickle.dump(value, f)
            tmp.replace(path)
        except Exception as e:  # unpicklable outputs, read-only data dir, ...
            _logger.debug("intermediate '%s' not persisted (%s)", name, e)
            tmp.unlink(missing_ok=True)

    def _resolve_input(self, name: str, store: Mapping[str, Any]):
        if name in store:
            return store[name]
        if name.startswith("params:"):
            v = self.params(name[len("params:"):])
            if v is None:
                raise KeyError(f"Parameter '{name}' not found in conf")
            return v
        if name in self.config.catalog:
            return self.load_catalog_entry(name)
        # partial run: the producing node was filtered out — fall back to the
        # persisted intermediate from an earlier run
        if self._persist_dir is not None:
            path = self._persist_dir / f"{name}.pkl"
            if path.exists():
                import pickle
                _logger.info("input '%s' loaded from intermediate cache %s",
                             name, path)
                with open(path, "rb") as f:
                    return pickle.load(f)
        raise KeyError(
            f"Input '{name}' is neither a prior node output, a catalog "
            f"entry, nor a persisted intermediate"
            + ("" if self._persist_dir is None else f" (looked in {self._persist_dir})")
            + " — run the producing node first (partial runs reuse "
              "data/02_intermediate/)")

    @staticmethod
    def _search_trial_run_name() -> Optional[str]:
        """Run name from the active HP-search trial, when running under one
        (reference: NNI experiment/trial ids, hooks.py:79-87)."""
        import os
        exp = os.environ.get("DEEPCV_SEARCH_EXPERIMENT") or os.environ.get("NNI_EXP_ID")
        trial = os.environ.get("DEEPCV_SEARCH_TRIAL") or os.environ.get("NNI_TRIAL_JOB_ID")
        if exp and exp != "STANDALONE":
            return f"{exp}_{trial or 'trial'}"
        return None
