"""LR schedules as optax schedule functions (declarative, jit-static).

Reference parity:
  * PiecewiseLinear with eval-string milestones
    (conf/base/parameters.yml:103-108 evaluated at
    ignite_training.py:227-231 with ``{'hp': hp, 'iterations': len(trainset)}``)
    -> :func:`piecewise_linear` + a SAFE ast-restricted evaluator for the
    reference's milestone strings;
  * OneCyclePolicy (deepcv.meta.one_cycle — a stub in the reference,
    one_cycle.py:21-51) -> :func:`one_cycle`, implemented per the 1-cycle
    paper (arXiv:1803.09820): linear/cos warmup to max_lr over pct_start then
    anneal to ~0, with inverse momentum cycling.
"""
from __future__ import annotations

import ast
import logging
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
import optax

from deepcv_tpu.utils import register

__all__ = ["piecewise_linear", "one_cycle", "build_schedule", "build_schedules",
           "safe_eval_milestones", "SCHEDULES"]

_logger = logging.getLogger(__name__)


def piecewise_linear(milestones_values: Sequence[Sequence[float]],
                     param_name: str = "lr") -> optax.Schedule:
    """ignite PiecewiseLinear parity: linear interpolation through
    [(step, value), ...] milestones; constant outside the range."""
    pts = sorted((int(s), float(v)) for s, v in milestones_values)
    steps = jnp.asarray([p[0] for p in pts], jnp.float32)
    vals = jnp.asarray([p[1] for p in pts], jnp.float32)

    def schedule(count):
        return jnp.interp(jnp.asarray(count, jnp.float32), steps, vals)

    return schedule


def one_cycle(max_lr: float, total_steps: int, base_lr: Optional[float] = None,
              final_lr: Optional[float] = None, pct_start: float = 0.3,
              base_momentum: float = 0.85, max_momentum: float = 0.95,
              anneal_strategy: str = "cos") -> Tuple[optax.Schedule, optax.Schedule]:
    """One-cycle LR policy (arXiv:1803.09820; reference one_cycle.py intent).

    Returns ``(lr_schedule, momentum_schedule)`` — momentum cycles inversely
    to LR (high->low->high).
    """
    base_lr = base_lr if base_lr is not None else max_lr / 25.0
    final_lr = final_lr if final_lr is not None else base_lr / 1e4
    up = max(1, int(pct_start * total_steps))
    down = max(1, total_steps - up)

    def interp(t, a, b):
        if anneal_strategy == "cos":
            return b + (a - b) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return a + (b - a) * t

    def lr_schedule(count):
        c = jnp.asarray(count, jnp.float32)
        t_up = jnp.clip(c / up, 0.0, 1.0)
        t_down = jnp.clip((c - up) / down, 0.0, 1.0)
        return jnp.where(c <= up, interp(t_up, base_lr, max_lr),
                         interp(t_down, max_lr, final_lr))

    def momentum_schedule(count):
        c = jnp.asarray(count, jnp.float32)
        t_up = jnp.clip(c / up, 0.0, 1.0)
        t_down = jnp.clip((c - up) / down, 0.0, 1.0)
        return jnp.where(c <= up, interp(t_up, max_momentum, base_momentum),
                         interp(t_down, base_momentum, max_momentum))

    return lr_schedule, momentum_schedule


# --------------------------------------------------------------------------- #
# Safe evaluation of the reference's milestone eval-strings
# --------------------------------------------------------------------------- #

_ALLOWED_NODES = (ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.List,
                  ast.Tuple, ast.Subscript, ast.Index, ast.Name, ast.Load, ast.Call,
                  ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
                  ast.Pow, ast.USub, ast.UAdd)
_ALLOWED_CALLS = {"int": int, "float": float, "round": round, "min": min,
                  "max": max, "len": len}


def safe_eval_milestones(expr: str, env: Mapping[str, Any]) -> Any:
    """Evaluate a milestone eval-string like
    ``"[[0, 0.0], [int(0.2 * hp['epochs'] * iterations), hp['optimizer_opts']['lr']], ...]"``
    with an ast-restricted evaluator — arithmetic, indexing, int/float/min/max
    only; names limited to the provided ``env`` (reference used bare eval,
    ignite_training.py:227-231)."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(f"Disallowed expression element {type(node).__name__} "
                             f"in milestone string: {expr!r}")
        if isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name) and node.func.id in _ALLOWED_CALLS):
                raise ValueError(f"Only {sorted(_ALLOWED_CALLS)} callable in milestone "
                                 f"strings, got: {ast.dump(node.func)}")

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, (ast.List, ast.Tuple)):
            return [ev(e) for e in node.elts]
        if isinstance(node, ast.Name):
            if node.id in env:
                return env[node.id]
            raise ValueError(f"Unknown name '{node.id}' in milestone string")
        if isinstance(node, ast.Subscript):
            return ev(node.value)[ev(node.slice)]
        if isinstance(node, ast.Call):
            return _ALLOWED_CALLS[node.func.id](*[ev(a) for a in node.args])
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand)
            return -v if isinstance(node.op, ast.USub) else +v
        if isinstance(node, ast.BinOp):
            a, b = ev(node.left), ev(node.right)
            return {ast.Add: lambda: a + b, ast.Sub: lambda: a - b,
                    ast.Mult: lambda: a * b, ast.Div: lambda: a / b,
                    ast.FloorDiv: lambda: a // b, ast.Mod: lambda: a % b,
                    ast.Pow: lambda: a ** b}[type(node.op)]()
        raise AssertionError(node)

    return ev(tree)


SCHEDULES: Dict[str, Callable] = {
    "piecewise_linear": piecewise_linear,
    "one_cycle": one_cycle,
    "constant": lambda value=1e-3, **_: optax.constant_schedule(float(value)),
    "cosine": lambda init_value, decay_steps, alpha=0.0, **_:
        optax.cosine_decay_schedule(float(init_value), int(decay_steps), float(alpha)),
    "warmup_cosine": lambda peak_value, warmup_steps, decay_steps, init_value=0.0, **_:
        optax.warmup_cosine_decay_schedule(float(init_value), float(peak_value),
                                           int(warmup_steps), int(decay_steps)),
    "exponential": lambda init_value, transition_steps, decay_rate, **_:
        optax.exponential_decay(float(init_value), int(transition_steps),
                                float(decay_rate)),
}
for _n, _f in SCHEDULES.items():
    register(f"schedule:{_n}", _f)
register("piecewise_linear", piecewise_linear)
register("one_cycle", one_cycle)


#: optimizer hyperparameters that may carry their own schedule
#: (reference README.md:122 "allow multiple schedulers" / :127 "momentum"
#: / :127 "similar policies for other hyperparameters (e.g. ... L2)")
SCHEDULABLE = ("lr", "momentum", "weight_decay")


def _build_one(spec: Mapping[str, Any], hp: Mapping[str, Any],
               iterations_per_epoch: int):
    spec = dict(spec)
    t = spec.get("type")
    ident = getattr(t, "identifier", t)
    name = str(ident).rsplit(".", 1)[-1]
    # map reference class names onto ours
    name = {"PiecewiseLinear": "piecewise_linear", "OneCyclePolicy": "one_cycle"}.get(name, name)
    if name not in SCHEDULES:
        raise ValueError(f"Unknown scheduler '{name}'; known: {sorted(SCHEDULES)}")
    kwargs = dict(spec.get("kwargs", {}))
    kwargs.pop("param_name", None)  # ignite plumbing, not needed
    env = {"hp": hp if isinstance(hp, dict) else dict(hp),
           "iterations": int(iterations_per_epoch)}
    for arg in spec.get("eval_args", []):
        if arg in kwargs and isinstance(kwargs[arg], str):
            kwargs[arg] = safe_eval_milestones(kwargs[arg], env)
    if name == "one_cycle":
        # bare `scheduler: one_cycle` convenience: cycle peaks at the
        # optimizer lr over the full run (torch OneCycleLR's defaults)
        opts = env["hp"].get("optimizer_opts") or {}
        if "max_lr" not in kwargs and "lr" in opts:
            kwargs["max_lr"] = float(opts["lr"])
        if "total_steps" not in kwargs and env["hp"].get("epochs"):
            kwargs["total_steps"] = int(env["hp"]["epochs"]) * int(env["iterations"])
    return SCHEDULES[name](**kwargs)


def build_schedules(spec: Optional[Mapping[str, Any]], hp: Mapping[str, Any],
                    iterations_per_epoch: int) -> Dict[str, optax.Schedule]:
    """Build every schedule a scheduler spec declares.

    Two accepted YAML forms:

    * single spec ``{type: ..., eval_args: [...], kwargs: {...}}`` (reference
      format, parameters.yml:103-108 / ignite_training.py:227-231) — returns
      ``{'lr': schedule}``; ``one_cycle`` additionally returns its inverse
      ``'momentum'`` cycle (arXiv:1803.09820 schedules BOTH; torch's
      OneCycleLR cycles momentum/beta1 the same way);
    * multi-target mapping ``{lr: <spec>, momentum: <spec>,
      weight_decay: <spec>}`` (reference README.md:122 "multiple schedulers",
      :127 momentum + other-hyperparameter policies) — one independent
      schedule per named optimizer hyperparameter.

    Eval-string kwargs named in ``eval_args`` are evaluated safely with
    ``{'hp': hp, 'iterations': iterations_per_epoch}``.
    """
    if not spec:
        return {}
    if isinstance(spec, str):  # bare `scheduler: one_cycle` shorthand
        spec = {"type": spec}
    if "type" in spec:  # single (reference) form
        out = _build_one(spec, hp, iterations_per_epoch)
        if isinstance(out, tuple):  # one_cycle -> (lr, momentum)
            return {"lr": out[0], "momentum": out[1]}
        return {"lr": out}
    unknown = set(spec) - set(SCHEDULABLE)
    if unknown:
        raise ValueError(f"Unknown scheduler targets {sorted(unknown)}; "
                         f"schedulable: {SCHEDULABLE} (or pass a single "
                         f"'type: ...' spec)")
    built: Dict[str, optax.Schedule] = {}
    for target, sub in spec.items():
        out = _build_one(sub, hp, iterations_per_epoch)
        if isinstance(out, tuple):  # one_cycle under an explicit target
            lr_s, mom_s = out
            built[target] = lr_s if target != "momentum" else mom_s
            if target == "lr":
                built.setdefault("momentum", mom_s)
        else:
            built[target] = out
    return built


def build_schedule(spec: Optional[Mapping[str, Any]], hp: Mapping[str, Any],
                   iterations_per_epoch: int) -> Optional[optax.Schedule]:
    """LR-only convenience wrapper over :func:`build_schedules`."""
    return build_schedules(spec, hp, iterations_per_epoch).get("lr")


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
