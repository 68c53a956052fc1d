"""Generic utilities (reference parity: /root/reference/src/deepcv/utils.py).

Functional differences from the reference, by design:
  * ``set_seeds`` returns a ``jax.random.PRNGKey`` — JAX randomness is
    explicit-key based; we also seed ``random``/``numpy`` for host-side code.
  * ``get_by_identifier`` resolves dotted identifiers against a *registry
    first*, import path second — the safe replacement for the reference's
    ruamel unsafe-YAML `!py!` object construction
    (/root/reference/src/deepcv/utils.py:55-62, run.py:44-46).
"""
from __future__ import annotations

import importlib
import logging
import random
import re
import time
import types
from functools import reduce
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Sequence, Union

import numpy as np

__all__ = [
    "NL", "set_seeds", "get_by_identifier", "identifier_to_str", "parse_slice",
    "recursive_getattr", "import_module_by_path", "Registry", "GLOBAL_REGISTRY",
    "register", "human_readable_size", "timed_call", "EventsHandler",
]

NL = "\n"
_logger = logging.getLogger(__name__)


def set_seeds(seed: int = 563454):
    """Seed host-side RNGs and return a fresh JAX PRNG key.

    Reference: ``deepcv.utils.set_seeds`` (utils.py:65-84) seeded
    random/numpy/torch; on TPU the device RNG is the returned key.
    """
    import jax

    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)


class Registry:
    """String-identifier -> python-object registry.

    Replaces the reference's unsafe-YAML ``!py!module.Class`` mechanism: YAML
    specs carry plain strings; resolution goes through this registry (exact
    name, then alias) and only falls back to module import for fully-dotted
    paths that resolve to *registered-safe module prefixes*.
    """

    #: module prefixes importable from YAML specs (safety allowlist)
    SAFE_IMPORT_PREFIXES = ("deepcv_tpu.", "jax.", "jax.nn.", "optax.", "flax.")

    def __init__(self, name: str = "global"):
        self.name = name
        self._entries: Dict[str, Any] = {}
        self._aliases: Dict[str, str] = {}

    def register(self, name: str, obj: Any = None, *, aliases: Sequence[str] = ()):
        """Register ``obj`` under ``name`` (usable as decorator when obj is None)."""
        def _do(o):
            if name in self._entries and self._entries[name] is not o:
                _logger.debug("Registry %s: overriding entry %s", self.name, name)
            self._entries[name] = o
            for a in aliases:
                self._aliases[a] = name
            return o

        return _do if obj is None else _do(obj)

    def __contains__(self, name: str) -> bool:
        return name in self._entries or name in self._aliases

    def get(self, name: str, default: Any = None) -> Any:
        if name in self._entries:
            return self._entries[name]
        if name in self._aliases:
            return self._entries[self._aliases[name]]
        return default

    def __getitem__(self, name: str) -> Any:
        v = self.get(name, default=_MISSING)
        if v is _MISSING:
            raise KeyError(f"'{name}' not registered in registry '{self.name}'. "
                           f"Known: {sorted(self._entries)[:40]}...")
        return v

    def names(self):
        return sorted(self._entries)


class _Missing:
    def __repr__(self):
        return "<MISSING>"


_MISSING = _Missing()
GLOBAL_REGISTRY = Registry("global")


def register(name: str, obj: Any = None, *, aliases: Sequence[str] = ()):
    """Register into the global registry (decorator-friendly)."""
    return GLOBAL_REGISTRY.register(name, obj, aliases=aliases)


_BUILTINS_LOADED = False


def _ensure_builtin_registrations():
    """Import the framework modules that populate the global registry, so
    resolution works regardless of what the caller imported first."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True
    import importlib
    for mod in ("deepcv_tpu.ops.nn", "deepcv_tpu.data.transforms",
                "deepcv_tpu.train.losses", "deepcv_tpu.train.schedules",
                "deepcv_tpu.train.metrics"):
        try:
            importlib.import_module(mod)
        except Exception as e:  # pragma: no cover
            _logger.warning("builtin registration import failed for %s: %s", mod, e)


def get_by_identifier(identifier: str, registry: Optional[Registry] = None) -> Any:
    """Resolve a string identifier to a Python object.

    Resolution order (reference: deepcv.utils.get_by_identifier utils.py:365-379,
    which eval'd arbitrary identifiers — here constrained for safety):
      1. registry exact name / alias (e.g. ``"relu"``, ``"conv2d"``);
      2. dotted import path limited to :attr:`Registry.SAFE_IMPORT_PREFIXES`.
    """
    registry = registry or GLOBAL_REGISTRY
    if identifier not in registry:
        _ensure_builtin_registrations()
    if identifier in registry:
        return registry[identifier]
    if "." in identifier:
        if not identifier.startswith(Registry.SAFE_IMPORT_PREFIXES):
            raise ValueError(
                f"Refusing to import '{identifier}': not registered and not under safe "
                f"prefixes {Registry.SAFE_IMPORT_PREFIXES}. Register it explicitly with "
                f"deepcv_tpu.utils.register().")
        module_name, _, attr = identifier.rpartition(".")
        mod = importlib.import_module(module_name)
        return recursive_getattr(mod, attr)
    raise ValueError(f"Cannot resolve identifier '{identifier}' "
                     f"(not in registry '{registry.name}', not a dotted path)")


def identifier_to_str(obj: Any) -> str:
    """Inverse-ish of :func:`get_by_identifier` for logging/serialization."""
    if isinstance(obj, str):
        return obj
    qual = getattr(obj, "__qualname__", None) or getattr(obj, "__name__", None)
    mod = getattr(obj, "__module__", "")
    return f"{mod}.{qual}" if qual else repr(obj)


def recursive_getattr(obj: Any, dotted: str) -> Any:
    """``recursive_getattr(m, "a.b.c") == m.a.b.c`` (reference utils.py)."""
    return reduce(getattr, dotted.split("."), obj)


_SLICE_RE = re.compile(r"^\s*(?:slice)?\s*\(?\s*(-?\d*)\s*:?\s*(-?\d*)\s*:?\s*(-?\d*)\s*\)?\s*$")


def parse_slice(expr: Union[str, slice]) -> slice:
    """Parse ``"1:3"``/``"::2"``/``"slice(1, 5)"``-style strings into ``slice``.

    Reference: ``deepcv.utils.parse_slice`` — used by the ``select_tensor``
    submodule creator (submodule_creators.py:189-200).
    """
    if isinstance(expr, slice):
        return expr
    if isinstance(expr, int):
        return slice(expr, expr + 1 if expr != -1 else None)
    s = str(expr).replace("slice", "").strip()
    if re.fullmatch(r"\(?\s*-?\d+\s*\)?", s) and ":" not in s:
        i = int(s.strip("() "))
        return slice(i, i + 1 if i != -1 else None)
    # normalize "slice(a, b, c)" comma form to colon form
    s = s.strip("() ").replace(",", ":")
    m = _SLICE_RE.match(s)
    if not m:
        raise ValueError(f"Cannot parse slice expression: {expr!r}")
    g = [int(x) if x else None for x in m.groups()]
    return slice(*g)


def import_module_by_path(path: str, module_name: str = None) -> types.ModuleType:
    """Load a python module from a filesystem path (reference ``import_tests``)."""
    import importlib.util
    from pathlib import Path

    p = Path(path)
    module_name = module_name or p.stem
    spec = importlib.util.spec_from_file_location(module_name, str(p))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def human_readable_size(num_bytes: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(num_bytes) < 1024.0:
            return f"{num_bytes:.2f}{unit}"
        num_bytes /= 1024.0
    return f"{num_bytes:.2f}PiB"


def timed_call(fn: Callable, *args, _label: str = None, **kwargs):
    """Run ``fn`` and log wall time (reference: kedro log_time node decorator,
    pipeline.py:24,43). Returns (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    dt = time.perf_counter() - t0
    _logger.info("%s took %.3fs", _label or getattr(fn, "__name__", "call"), dt)
    return out, dt


def test_module_cli(module_file: str):
    """Run the pytest tests covering a framework module, from the module
    itself (reference per-module self-test CLI: every module ends with
    ``import_tests().test_module_cli(__file__)``, tests_utils.py:63-79 —
    so ``python deepcv_tpu/ops/nn.py`` runs its own tests).

    Our tests live under tests/ named by subsystem; this maps a module path
    to its test file(s) and invokes pytest on them (falling back to the whole
    suite when no specific file matches).
    """
    from pathlib import Path
    import sys

    mod = Path(module_file).resolve()
    repo = mod
    while repo.name != "deepcv_tpu" and repo.parent != repo:
        repo = repo.parent
    tests_dir = repo.parent / "tests"
    mapping = {
        "nn.py": "test_spec_engine.py", "hrnet.py": "test_pipelines.py",
        "creators.py": "test_spec_engine.py", "graph.py": "test_spec_engine.py",
        "module.py": "test_spec_engine.py", "transforms.py": "test_data_transforms.py",
        "augmentation.py": "test_data_transforms.py",
        "datasets.py": "test_data_pipeline.py", "preprocess.py": "test_data_pipeline.py",
        "pipeline.py": "test_data_pipeline.py", "training.py": "test_training.py",
        "losses.py": "test_training.py", "schedules.py": "test_training.py",
        "backend.py": "test_training.py", "checkpoint.py": "test_training.py",
        "config.py": "test_config.py", "hyperparams.py": "test_hyperparams.py",
        "utils.py": "test_utils.py", "fused_layer.py": "test_pallas.py",
        "fused_augment.py": "test_pallas.py", "native.py": "test_runtime_native.py",
        "geometry.py": "test_geometry.py", "singan.py": "test_singan.py",
        "serve.py": "test_serving_and_jsd.py",
        "parallel.py": "test_meta_subsystems.py",
        "metrics.py": "test_training.py", "loggers.py": "test_pipelines.py",
        "nas.py": "test_search.py", "tuners.py": "test_search.py",
        "runner.py": "test_search.py", "detection.py": "test_detection.py",
        "video.py": "test_meta_subsystems.py",
        "keypoints.py": "test_serving_and_jsd.py",
        "active_learning.py": "test_active_learning.py",
        "codec.py": "test_codec.py", "range_coder.py": "test_codec.py",
    }
    target = tests_dir / mapping.get(mod.name, "")
    args = [str(target) if target.is_file() else str(tests_dir), "-q"]
    import pytest
    sys.exit(pytest.main(args + sys.argv[1:]))


class EventsHandler:
    """Tiny pub/sub event dispatcher (reference ``deepcv.utils.EventsHandler``).

    Used by the training loop for ITERATION_COMPLETED / EPOCH_COMPLETED-style
    hooks without an ignite dependency.
    """

    def __init__(self, *event_names: str):
        self._handlers: Dict[str, list] = {n: [] for n in event_names}

    def add_event(self, name: str):
        self._handlers.setdefault(name, [])

    def on(self, event: str, fn: Callable = None, *, every: int = 1):
        """Attach handler; ``every=k`` fires on counts divisible by k."""
        if event not in self._handlers:
            raise KeyError(f"Unknown event '{event}'. Known: {list(self._handlers)}")

        def _wrap(f):
            self._handlers[event].append((every, f))
            return f

        return _wrap if fn is None else _wrap(fn)

    def fire(self, event: str, count: int = 1, **ctx):
        for every, f in self._handlers.get(event, ()):
            if count % max(1, every) == 0:
                f(**ctx)
