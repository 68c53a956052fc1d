"""Architecture-spec -> static DAG compiler and its executor module.

Reference parity: ``deepcv.meta.nn_spec.define_nn_architecture`` and the
``DeepcvModule.forward`` reference-aware execution
(/root/reference/src/deepcv/meta/nn_spec.py:55-243,
 /root/reference/src/deepcv/meta/base_module.py:113-155).

TPU-first differences:
  * the spec is compiled ONCE into a static node list; execution is a single
    trace — no per-submodule dummy forwards (reference does O(n^2) forwards at
    build, nn_spec.py:102-104); shape inference when needed is
    ``jax.eval_shape`` over the whole graph (zero FLOPs);
  * tensor-reference "memory management" (base_module.py:131-141) is
    irrelevant under XLA (liveness is the compiler's job) — we only track
    which outputs are referenced;
  * NAS choice points resolve at trace time: 'fixed' mode picks one candidate
    per mutable (classic-NAS trials / exported architectures), 'supernet' mode
    builds every candidate with softmax-weighted mixing over trainable
    architecture logits (DARTS-style single-shot NAS) — weights live in the
    'params' collection under the ``arch__`` prefix so they can be partitioned
    with an optax mask.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as fnn

from deepcv_tpu.ops import nn as dnn
from deepcv_tpu.spec.tokens import YamlTokens as T
from deepcv_tpu.spec.creators import (
    CreatorContext, ForwardCallback, get_creator, check_creator_params,
    get_reduction_fn,
)
from deepcv_tpu.utils import GLOBAL_REGISTRY

__all__ = ["SpecError", "NodeMeta", "define_nn_architecture", "SpecModule"]

ARCH_PARAM_PREFIX = "arch__"


class SpecError(ValueError):
    """Raised for invalid architecture specifications."""


@dataclasses.dataclass(frozen=True)
class NodeMeta:
    """Static per-node metadata (hashable; safe as linen attribute)."""
    name: str
    kind: str                                   # 'module' | 'callback' | 'choice'
    creator: str = ""
    refs: Tuple[str, ...] = ()
    # supernet input choice: (choice_name, n_candidates, n_chosen)
    input_choice: Optional[Tuple[str, int, int]] = None
    # supernet layer choice: candidate count
    n_candidates: int = 0


# --------------------------------------------------------------------------- #
# Spec entry parsing helpers
# --------------------------------------------------------------------------- #

def _is_tagged(obj) -> bool:
    return hasattr(obj, "identifier") and hasattr(obj, "resolve")


def _entry_name_and_params(entry: Any, index: int):
    """Extract (explicit_name, creator_key, params) from one spec list entry
    (reference ``_subm_name_and_params_from_spec``, nn_spec.py:194-215)."""
    if _is_tagged(entry):
        return None, entry, {}
    if isinstance(entry, str):
        return None, entry, {}
    if not isinstance(entry, Mapping) or len(entry) != 1:
        raise SpecError(
            f"Architecture entry #{index} must be a single-key mapping "
            f"'{{creator: params}}' (or a !py! tag), got: {entry!r}")
    (key, value), = entry.items()
    name = None
    if isinstance(value, (list, tuple)) and len(value) == 2 and isinstance(value[0], str) \
            and isinstance(value[1], Mapping):
        name, params = value[0], dict(value[1])
    elif isinstance(value, Mapping):
        params = dict(value)
    elif value is None:
        params = {}
    else:
        params = {"args": value}
    if T.NAME in params:
        name = params.pop(T.NAME)
    return name, key, params


def _extract_refs(params: Dict[str, Any]):
    """Pop ``_from`` / ``_from_nas_input_choice`` from params.

    Returns (refs, nas_input_choice_candidates, n_chosen).
    """
    refs = params.pop(T.FROM, None)
    choice = params.pop(T.FROM_NAS_INPUT_CHOICE, None)
    n_chosen = int(params.pop(T.N_CHOSEN, 1))
    params.pop(T.RETURN_MASK, None)  # mask output not supported (NNI-specific)
    as_tuple = lambda v: tuple([v] if isinstance(v, str) else list(v or []))
    return as_tuple(refs), as_tuple(choice), n_chosen


# --------------------------------------------------------------------------- #
# The compiler
# --------------------------------------------------------------------------- #

def define_nn_architecture(architecture: Sequence[Any], hp: Mapping[str, Any],
                           ctx: CreatorContext,
                           ) -> Tuple[Tuple[NodeMeta, ...], Dict[str, Any], Tuple[str, ...]]:
    """Compile a YAML architecture list into (node_metas, node_impls, referenced).

    ``node_impls`` maps node name -> a flax module, a
    :class:`ForwardCallback`, or — for supernet layer choices — a tuple of
    candidate flax modules. Dict keying gives human-readable flax param scopes
    (``node_impls_<name>``).
    """
    if not isinstance(architecture, (list, tuple)) or not architecture:
        raise SpecError(f"'architecture' must be a non-empty list, got {type(architecture)}")

    metas: List[NodeMeta] = []
    impls: List[Any] = []
    names_seen: Dict[str, int] = {}

    def unique_name(explicit: Optional[str], creator_key: str, idx: int) -> str:
        name = explicit or f"_submodule_{idx}_{_creator_label(creator_key)}"
        if name in names_seen:
            raise SpecError(f"Duplicate submodule name '{name}' "
                            f"(reference nn_spec.py:209-210 semantics)")
        names_seen[name] = idx
        return name

    for idx, entry in enumerate(architecture):
        explicit_name, key, params = _entry_name_and_params(entry, idx)

        # ---- NAS layer choice --------------------------------------------- #
        if isinstance(key, str) and key == T.NAS_LAYER_CHOICE:
            candidates = params.pop(T.CANDIDATES, None)
            if not candidates:
                raise SpecError(f"'{T.NAS_LAYER_CHOICE}' entry #{idx} needs '{T.CANDIDATES}'")
            name = unique_name(explicit_name, "layer_choice", idx)
            if ctx.nas_mode == "supernet":
                cand_impls = []
                for ci, cand in enumerate(candidates):
                    c_name, c_key, c_params = _entry_name_and_params(cand, idx)
                    mod = _build_module_node(c_key, c_params, hp, ctx,
                                             f"{name}_cand{ci}")
                    cand_impls.append(mod)
                metas.append(NodeMeta(name=name, kind="choice", creator="layer_choice",
                                      n_candidates=len(cand_impls)))
                impls.append(tuple(cand_impls))
            else:
                choice = ctx.nas_arch.get(name, 0)
                choice = int(choice) if not isinstance(choice, (list, tuple)) else int(choice[0])
                if not (0 <= choice < len(candidates)):
                    raise SpecError(f"nas_arch['{name}']={choice} out of range "
                                    f"(0..{len(candidates) - 1})")
                c_name, c_key, c_params = _entry_name_and_params(candidates[choice], idx)
                mod = _build_module_node(c_key, c_params, hp, ctx, name)
                metas.append(NodeMeta(name=name, kind="module", creator=str(c_key)))
                impls.append(mod)
            ctx = dataclasses.replace(ctx, submodule_names=tuple(names_seen))
            continue

        # ---- nested module ------------------------------------------------ #
        if isinstance(key, str) and key in (T.NESTED_DEEPCV_MODULE, T.NESTED_DEEPCV_MODULE_ALT):
            sub_hp = entry[key]
            if isinstance(sub_hp, (list, tuple)):
                sub_hp = {"architecture": list(sub_hp)}
            sub_hp = dict(sub_hp)
            sub_arch = sub_hp.get("architecture")
            if sub_arch is None:
                raise SpecError(f"Nested module entry #{idx} has no 'architecture'")
            name = unique_name(explicit_name or sub_hp.get(T.NAME), "nested", idx)
            # nested mutables are addressed '<nested_name>/<local_name>'
            # (search/nas.py list_mutables/export_architecture emit the same
            # namespace); un-prefixed keys pass through for backward compat
            sub_nas = {**{k: v for k, v in ctx.nas_arch.items() if "/" not in k},
                       **{k.split("/", 1)[1]: v for k, v in ctx.nas_arch.items()
                          if k.startswith(name + "/")}}
            sub_ctx = dataclasses.replace(ctx, nas_arch=sub_nas,
                                          scope=f"{ctx.scope}{name}/")
            sub_metas, sub_impls, sub_refd = define_nn_architecture(sub_arch, sub_hp, sub_ctx)
            nested = SpecModule(node_metas=sub_metas, node_impls=sub_impls,
                                referenced=sub_refd)
            metas.append(NodeMeta(name=name, kind="module", creator="nested"))
            impls.append(nested)
            ctx = dataclasses.replace(ctx, submodule_names=tuple(names_seen))
            continue

        # ---- regular creator / tagged module ------------------------------ #
        refs, choice_cands, n_chosen = _extract_refs(params)
        name = unique_name(explicit_name, key if isinstance(key, str) else
                           getattr(key, "identifier", "module"), idx)

        # validate references point to already-defined submodules
        for r in (*refs, *choice_cands):
            if r not in names_seen or names_seen[r] >= idx:
                raise SpecError(
                    f"Submodule '{name}' references undefined/later submodule '{r}' "
                    f"(defined so far: {sorted(names_seen)}) — reference nn_spec.py:98-101")

        impl = _build_module_node(key, dict(params), hp, ctx, name)

        if isinstance(impl, ForwardCallback):
            input_choice = None
            if choice_cands:
                if ctx.nas_mode == "supernet":
                    input_choice = (name, len(choice_cands), n_chosen)
                    all_refs = choice_cands
                else:
                    chosen = ctx.nas_arch.get(name, list(range(min(n_chosen, len(choice_cands)))))
                    if isinstance(chosen, (int, str)):
                        chosen = [chosen]
                    picked = []
                    for c in chosen:
                        picked.append(choice_cands[int(c)] if not isinstance(c, str) else c)
                    all_refs = tuple(picked)
            else:
                all_refs = refs
            if not all_refs and impl.uses_current is False:
                raise SpecError(f"'{name}': new-branch node requires '{T.FROM}' or "
                                f"'{T.FROM_NAS_INPUT_CHOICE}' references")
            metas.append(NodeMeta(name=name, kind="callback", creator=str(key),
                                  refs=tuple(all_refs), input_choice=input_choice))
            impls.append(impl)
        else:
            if refs or choice_cands:
                raise SpecError(f"Submodule '{name}' ({key}): '{T.FROM}' references are only "
                                f"valid on link/branch creators")
            metas.append(NodeMeta(name=name, kind="module",
                                  creator=str(getattr(key, "identifier", key))))
            impls.append(impl)
        ctx = dataclasses.replace(ctx, submodule_names=tuple(names_seen))

    referenced = tuple(sorted({r for m in metas for r in m.refs}))
    impls_by_name = {m.name: impl for m, impl in zip(metas, impls)}
    return tuple(metas), impls_by_name, referenced


def _creator_label(key) -> str:
    if _is_tagged(key):
        return key.identifier.rsplit(".", 1)[-1].lower()
    return str(key).lstrip("_")


def _build_module_node(key, params: Dict[str, Any], hp: Mapping[str, Any],
                       ctx: CreatorContext, name: str):
    """Dispatch one spec entry to its creator / registered module class
    (reference nn_spec.py:107-191 dispatch)."""
    # strip graph-level tokens the creators don't consume
    params = {k: v for k, v in params.items() if k not in (T.FROM, T.FROM_NAS_INPUT_CHOICE,
                                                           T.N_CHOSEN, T.RETURN_MASK)}
    if _is_tagged(key):
        obj = key.resolve()
        merged = {**key.kwargs, **params}
        return _instantiate_module(obj, merged, ctx, name)

    entry = get_creator(key)
    if entry is None:
        # fall back to a registered module class / factory by plain name
        obj = GLOBAL_REGISTRY.get(key)
        if obj is None:
            raise SpecError(f"Unknown submodule creator or module '{key}' "
                            f"(node '{name}')")
        return _instantiate_module(obj, params, ctx, name)

    # global->local param merge: forward whitelisted global hp keys
    merged = {k: hp[k] for k in entry["global_keys"] if k in hp}
    merged.update(params)
    check_creator_params(key, merged)
    return entry["fn"](merged, ctx, name)


def _instantiate_module(obj, kwargs: Dict[str, Any], ctx: CreatorContext, name: str):
    if isinstance(obj, type) and issubclass(obj, fnn.Module):
        return obj(name=name, **kwargs)
    if callable(obj):
        out = obj(**kwargs) if kwargs else obj()
        if isinstance(out, fnn.Module):
            return out
    raise SpecError(f"Object for node '{name}' is not a flax module: {obj!r}")


# --------------------------------------------------------------------------- #
# The executor
# --------------------------------------------------------------------------- #

def _call_node(mod: fnn.Module, x, train: bool):
    try:
        return mod(x, train=train)
    except TypeError as e:
        if "train" not in str(e):
            raise
        return mod(x)


def clone_with_forced_arch(module: "SpecModule", arch):
    """Clone a (possibly nested) SpecModule with ``forced_arch`` applied at
    every nesting level: '<nested_name>/<local>' keys route to the nested
    SpecModule held under ``node_impls[nested_name]`` (a bare clone would
    force only the outer module's choices)."""
    arch = dict(arch)
    impls = dict(module.node_impls)
    for name, impl in impls.items():
        if isinstance(impl, SpecModule):
            sub = {k.split("/", 1)[1]: v for k, v in arch.items()
                   if k.startswith(name + "/")}
            if sub:
                impls[name] = clone_with_forced_arch(impl, sub)
    return module.clone(forced_arch=arch, node_impls=impls)


class SpecModule(fnn.Module):
    """Executes a compiled architecture DAG (DeepcvModule core forward,
    reference base_module.py:113-155 — with the §8 early-return bug fixed).

    Supernet choice mixing (``sampling``):
      * 'softmax' (DARTS): candidates mixed by softmax over trainable
        ``arch__*`` logits;
      * 'sampled' (ProxylessNAS binary gates): per-call ONE candidate drawn
        from the softmax distribution (Gumbel-max over the logits, 'nas' rng
        stream) — the straight-through one-hot routes the gate gradient to
        the logits (paper eq. 4); eval uses argmax;
      * 'uniform' (SPOS): per-call ONE candidate drawn uniformly, logits NOT
        trained — selection happens post-hoc on validation.
    """
    node_metas: Tuple[NodeMeta, ...]
    node_impls: Dict[str, Any]
    referenced: Tuple[str, ...] = ()
    # optional host-side shape recorder called at trace time (descriptor use)
    shape_cb: Optional[Callable] = None
    sampling: str = "softmax"
    #: force specific choices (name -> candidate idx) while KEEPING the
    #: supernet param tree — used to evaluate candidate architectures with
    #: shared weights (SPOS evaluation flow)
    forced_arch: Optional[Any] = None

    def _choice_weights(self, name: str, n: int, train: bool):
        logits = self.param(f"{ARCH_PARAM_PREFIX}{name}",
                            fnn.initializers.zeros, (n,))
        if self.forced_arch is not None and name in self.forced_arch:
            c = self.forced_arch[name]
            if isinstance(c, (list, tuple)):
                # n_chosen > 1: mean multi-hot over ALL chosen candidates
                # (a bare c[0] one-hot silently dropped the rest); dividing by
                # len(c) keeps the mixture magnitude consistent with the
                # softmax weights (which sum to 1)
                w = sum(jax.nn.one_hot(int(i), n) for i in c) / float(len(c))
                return w
            return jax.nn.one_hot(int(c), n)
        if self.sampling == "sampled":
            # binary-gate path sampling (ProxylessNAS, arXiv:1812.00332):
            # ONE path drawn from softmax(logits) (Gumbel-max), the gate's
            # gradient routed to the logits through the softmax jacobian —
            # the straight-through form below IS the paper's eq. 4 estimator
            # dL/da_i = sum_j dL/dg_j p_j (delta_ij - p_i)
            if train and self.has_rng("nas"):
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(self.make_rng("nas"), (n,), minval=1e-6,
                                       maxval=1.0 - 1e-6)))
                idx = jnp.argmax(logits + g)
            else:
                idx = jnp.argmax(logits)
            hard = jax.nn.one_hot(idx, n)
            soft = jax.nn.softmax(logits)
            return hard + soft - jax.lax.stop_gradient(soft)  # straight-through
        if self.sampling == "uniform":
            # true SPOS (arXiv:1904.00420): paths sampled UNIFORMLY, arch
            # logits NOT trained — architecture selection happens after
            # supernet training by scoring candidates on validation with the
            # shared weights (nas.py::_select_arch_by_validation)
            if train and self.has_rng("nas"):
                idx = jax.random.randint(self.make_rng("nas"), (), 0, n)
            else:
                idx = jnp.argmax(logits)
            return jax.lax.stop_gradient(jax.nn.one_hot(idx, n))
        return jax.nn.softmax(logits)

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        stored: Dict[str, Any] = {}
        refd = set(self.referenced)
        for meta in self.node_metas:
            impl = self.node_impls[meta.name]
            if meta.kind == "callback":
                refs = [stored[r] for r in meta.refs]
                if meta.input_choice is not None:
                    cname, n_cand, n_chosen = meta.input_choice
                    w = self._choice_weights(cname, n_cand, train)
                    # candidates may come from different resolutions (the
                    # fixed path rescales each ref inside the link callback);
                    # resize them to the first candidate's spatial dims so
                    # the weighted mixture is well-formed
                    from deepcv_tpu.ops.nn import interpolate
                    tgt = refs[0].shape[1:-1]
                    cands = [r if tuple(r.shape[1:-1]) == tuple(tgt)
                             else interpolate(r, tgt) for r in refs]
                    combined = sum(w[i] * cands[i] for i in range(n_cand))
                    refs = [combined]
                x = impl(x, refs)
            elif meta.kind == "choice":
                outs = [_call_node(c, x, train) for c in impl]
                w = self._choice_weights(meta.name, len(outs), train)
                x = sum(w[i] * outs[i] for i in range(len(outs)))
            else:
                x = _call_node(impl, x, train)
            if meta.name in refd:
                stored[meta.name] = x
            if self.shape_cb is not None:
                shape = [tuple(t.shape) for t in x] if isinstance(x, (list, tuple)) \
                    else tuple(x.shape)
                self.shape_cb(meta.name, shape)
        return x

    @property
    def submodule_names(self) -> Tuple[str, ...]:
        return tuple(m.name for m in self.node_metas)


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
