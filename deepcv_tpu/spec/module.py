"""DeepcvModule — YAML-declared model facade over the compiled spec DAG.

Reference parity: ``deepcv.meta.base_module``
(/root/reference/src/deepcv/meta/base_module.py):
  * hp handling with ``HP_DEFAULTS`` + required keys (base_module.py:68, 98);
  * architecture compilation (``define_nn_architecture``, :101);
  * Xavier init with per-activation gain (``_initialize_parameters``,
    :230-264) — here baked into each creator's ``kernel_init``;
  * global weight-norm / spectral-norm (:106-111) — flax WeightNorm /
    SpectralNorm wrappers around every layer op;
  * human-readable descriptor (``DeepcvModuleDescriptor``, :352-413);
  * shared image-embedding block for cross-model transfer learning
    (``DeepcvModuleWithSharedImageBlock``, :267-349) — TPU-native sharing is
    a shared *parameter subtree*, injected/extracted by name.

The model itself is pure: ``init(rng) -> variables``,
``apply(variables, x, train=...) -> y[, updated_state]``.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as fnn
from flax.core import freeze, unfreeze

from deepcv_tpu.hyperparams import Hyperparameters, to_hyperparameters
from deepcv_tpu.ops import nn as dnn
from deepcv_tpu.spec.creators import CreatorContext
from deepcv_tpu.spec.graph import SpecModule, define_nn_architecture, SpecError

__all__ = ["DeepcvModule", "DeepcvModuleDescriptor", "SharedImageEmbedding",
           "DeepcvModuleWithSharedImageBlock"]

_logger = logging.getLogger(__name__)

#: collections auto-made mutable in train-mode apply when the init
#: variables carry them (batch stats; MoE load-balance aux — ops/moe.py)
_STATE_COLLECTIONS = ("batch_stats", "moe_losses")


def _rebuild_model(cls, input_shape, hp, options):
    """Unpickle helper for DeepcvModule.__reduce__ (module-level for pickle)."""
    return cls(input_shape, hp, **options)


class DeepcvModule:
    """A compiled YAML-spec model with pure init/apply.

    Unlike the reference torch ``nn.Module``, this is a thin immutable facade:
    construction compiles the spec; parameters exist only as pytrees the
    caller owns.
    """

    #: reference HP_DEFAULTS parity (base_module.py:68): 'architecture' and
    #: 'act_fn' required; every norm technique optional.
    HP_DEFAULTS: Dict[str, Any] = {
        "architecture": ...,
        "act_fn": ...,
        "dropout_prob": 0.0,
        "preactivation": False,
        "batch_norm": None,
        "layer_norm": None,
        "instance_norm": None,
        "group_norm": None,
        "local_response_norm": None,
        "layer_nrm_and_mean_batch_nrm": None,
        "weight_norm": None,
        "spectral_norm": None,
    }

    def __init__(self, input_shape: Sequence[int], hp: Mapping[str, Any], *,
                 dtype: Any = None, param_dtype: Any = jnp.float32,
                 axis_name: Optional[str] = None, nas_mode: str = "fixed",
                 nas_arch: Optional[Mapping[str, Any]] = None,
                 nas_sampling: str = "softmax",
                 quantize: Optional[str] = None,
                 quantize_scales: Optional[Mapping[str, float]] = None,
                 name: Optional[str] = None):
        #: channel-last input shape WITHOUT batch dim, e.g. (32, 32, 3)
        self.input_shape = tuple(int(s) for s in input_shape)
        self._hp, _ = to_hyperparameters(hp, self.HP_DEFAULTS, raise_if_missing=True)
        self.dtype = dtype
        self.param_dtype = param_dtype
        self.axis_name = axis_name
        self.nas_mode = nas_mode
        self.nas_arch = dict(nas_arch or {})
        #: 'int8' => conv/dense compute in w8a8 (MXU int8 path); the param
        #: tree is IDENTICAL to the float build, so trained checkpoints /
        #: bundles restore into a quantized rebuild unchanged
        self.quantize = quantize
        self.quantize_scales = dict(quantize_scales or {})
        self.nas_sampling = nas_sampling

        def _any_dropout(node) -> bool:
            # every spec key whose module consumes the 'dropout' rng stream:
            # plain dropout, stochastic depth (ViT/ConvNeXt drop_path), and
            # attention-probability dropout — missing one here silently
            # routes train=True through the constant-key fallback, turning
            # the regularizer into a FIXED structural mask
            if isinstance(node, Mapping):
                if any(float(node.get(k) or 0.0) > 0.0
                       for k in ("dropout_prob", "drop_path_prob",
                                 "attn_dropout_prob")):
                    return True
                return any(_any_dropout(v) for v in node.values())
            if isinstance(node, (list, tuple)):
                return any(_any_dropout(v) for v in node)
            return False

        self._has_dropout = _any_dropout(dict(self._hp))
        ctx = CreatorContext(
            hp=self._hp, dtype=dtype, param_dtype=param_dtype, axis_name=axis_name,
            nas_mode=nas_mode, nas_arch=self.nas_arch,
            conv_spatial_rank=max(1, len(self.input_shape) - 1),
            weight_norm=self._hp.get("weight_norm"),
            spectral_norm=self._hp.get("spectral_norm"),
            quantize=quantize, quantize_scales=dict(quantize_scales or {}))
        metas, impls, refd = define_nn_architecture(self._hp["architecture"], self._hp, ctx)
        self.module = SpecModule(node_metas=metas, node_impls=impls, referenced=refd,
                                 sampling=nas_sampling, name=name)

    # ------------------------------------------------------------------ API
    def _ctor_options(self) -> Dict[str, Any]:
        """Constructor kwargs that reproduce this build (subclasses extend)."""
        return dict(dtype=self.dtype, param_dtype=self.param_dtype,
                    axis_name=self.axis_name, nas_mode=self.nas_mode,
                    nas_arch=self.nas_arch, nas_sampling=self.nas_sampling,
                    quantize=self.quantize, quantize_scales=self.quantize_scales)

    def __reduce__(self):
        """Pickle as (input_shape, hp, options) and REBUILD on load — the
        compiled flax graph holds creator closures that cannot pickle, but
        the spec fully determines it. Makes models persistable as pipeline
        intermediates (partial runs) and shippable across processes."""
        return (_rebuild_model, (type(self), self.input_shape,
                                 self._hp.to_dict(), self._ctor_options()))

    def with_options(self, **overrides) -> "DeepcvModule":
        """Rebuild this model with the SAME architecture and NAS options,
        overriding only the given constructor kwargs (``quantize=...``,
        ``dtype=...``, ``quantize_scales=...``).

        The param tree of the rebuild is identical to this model's, so
        trained variables restore unchanged. Use this instead of calling
        ``DeepcvModule(model.input_shape, model.hp.to_dict())`` by hand —
        a manual rebuild silently drops ``nas_mode``/``nas_arch`` and would
        run a different (default-choice) graph for NAS-exported bundles.
        """
        kw = self._ctor_options()
        kw.update(overrides)
        return type(self)(self.input_shape, self._hp.to_dict(), **kw)

    @property
    def hp(self) -> Hyperparameters:
        return self._hp

    @property
    def is_sequential_nn(self) -> bool:
        """True when no submodule references exist (pure chain) —
        reference ``is_sequential_nn`` (base_module.py:179-182)."""
        return not self.module.referenced and all(
            m.kind == "module" for m in self.module.node_metas)

    def dummy_input(self, batch_size: int = 1, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch_size, *self.input_shape), dtype=dtype)

    def _dag_input(self, batch_size: int = 1) -> jnp.ndarray:
        """The tensor the spec DAG actually receives (subclasses that prepend
        processing — e.g. the shared image block's channel concat — override
        this so shape inference/describe see the real channel count)."""
        return self.dummy_input(batch_size)

    def init(self, rng, batch_size: int = 1):
        """Initialize all variable collections (params + batch_stats...)."""
        if not hasattr(rng, "shape"):
            rng = jax.random.PRNGKey(int(rng))
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1),
                "nas": jax.random.fold_in(rng, 2)}
        return self.module.init(rngs, self.dummy_input(batch_size), train=False)

    def apply(self, variables, x, *, train: bool = False, rngs=None,
              mutable: Union[bool, Sequence[str], None] = None):
        """Forward pass. When ``train=True`` and the model has state
        collections (batch stats), returns ``(y, updated_state)``."""
        if train and self.quantize and not str(self.quantize).endswith("_qat"):
            # REAL w8a8 ops round/clip inside the graph: gradients through
            # them are zero almost everywhere, so training would silently not
            # learn. Train the float build (or the 'int8_qat' fake-quant
            # build, whose straight-through estimator keeps gradients alive);
            # rebuild with quantize='int8' for serving.
            raise ValueError(
                f"quantize={self.quantize!r} models are inference-only "
                "(round/clip kills gradients); train the float or "
                "'int8_qat' build and rebuild with quantize for serving")
        if mutable is None:
            cols = [c for c in _STATE_COLLECTIONS if c in variables] if train else []
            mutable = cols if cols else False
        if train and rngs is None:
            if self._has_dropout:
                # a silent constant key would drop the SAME units every step,
                # turning dropout into a fixed structural mask
                raise ValueError(
                    "train=True on a model with dropout requires rngs="
                    "{'dropout': key} (a fresh key per step)")
            rngs = {"dropout": jax.random.PRNGKey(0)}
        return self.module.apply(variables, x, train=train, rngs=rngs, mutable=mutable)

    def eval_output_shape(self, batch_size: int = 1):
        """Output shape via abstract evaluation — zero FLOPs."""
        out = jax.eval_shape(lambda: self.module.init_with_output(
            {"params": jax.random.PRNGKey(0)}, self._dag_input(batch_size))[0])
        return out.shape if hasattr(out, "shape") else [o.shape for o in out]

    def capacity(self, variables=None) -> int:
        if variables is None:
            variables = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        params = variables.get("params", variables)
        return dnn.get_model_capacity(params)

    def describe(self, batch_size: int = 1) -> "DeepcvModuleDescriptor":
        return DeepcvModuleDescriptor(self, batch_size=batch_size)

    def __repr__(self):
        return (f"DeepcvModule(input_shape={self.input_shape}, "
                f"submodules={list(self.module.submodule_names)})")


class DeepcvModuleDescriptor:
    """Human-readable model description: per-submodule capacity and output
    feature shapes (reference base_module.py:352-413) — computed with
    ``jax.eval_shape``, no device work."""

    def __init__(self, model: DeepcvModule, batch_size: int = 1):
        self.model = model
        x = model._dag_input(batch_size)
        self.features_shapes: Dict[str, Any] = {}

        def record(name, shape):
            self.features_shapes[name] = shape

        shape_mod_rec = model.module.clone(shape_cb=record)

        def init_abstract():
            return shape_mod_rec.init_with_output(
                {"params": jax.random.PRNGKey(0)}, x, train=False)

        out, variables = jax.eval_shape(init_abstract)
        self.output_shape = out.shape if hasattr(out, "shape") else [o.shape for o in out]
        params = variables.get("params", {})
        self.submodules_capacities: Dict[str, int] = {}
        for meta in model.module.node_metas:
            sub = params.get(f"node_impls_{meta.name}")
            self.submodules_capacities[meta.name] = dnn.get_model_capacity(sub) if sub else 0
        # total capacity from the MODEL's init (covers params outside the
        # spec DAG, e.g. the shared image block); per-submodule numbers above
        # come from the DAG trace
        full = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
        self.capacity = dnn.get_model_capacity(full.get("params", full))

    def __str__(self) -> str:
        lines = [f"DeepcvModule  input={self.model.input_shape}  "
                 f"capacity={self.capacity:,} params"]
        for meta in self.model.module.node_metas:
            shape = self.features_shapes.get(meta.name, "?")
            cap = self.submodules_capacities.get(meta.name, 0)
            refs = f"  <- {list(meta.refs)}" if meta.refs else ""
            lines.append(f"  {meta.name:40s} {meta.creator:18s} out={shape} "
                         f"params={cap:,}{refs}")
        lines.append(f"  output shape: {self.output_shape}")
        return "\n".join(lines)


# --------------------------------------------------------------------------- #
# Shared image-embedding block (transfer learning across models)
# --------------------------------------------------------------------------- #

class SharedImageEmbedding(fnn.Module):
    """4-conv image embedding shared across DeepcvModules
    (reference ``_define_shared_image_embedding_block``, base_module.py:334-349)."""
    features: Tuple[int, ...] = (8, 16, 32, 32)
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        for i, f in enumerate(self.features):
            x = dnn.pad_channels_for_tpu(x)
            x = fnn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                         name=f"shared_conv{i}")(x)
            x = jax.nn.relu(x)
        return x


class DeepcvModuleWithSharedImageBlock(DeepcvModule):
    """DeepcvModule preceded by a shared image-embedding block.

    Sharing on TPU is parameter-subtree reuse: :meth:`extract_shared_params` /
    :meth:`inject_shared_params` move the block's params between models;
    :meth:`frozen_mask` yields an optax mask freezing the shared block
    (reference fork/merge/freeze semantics, base_module.py:267-333 — fork &
    merge were unimplemented in the reference; here fork == extract+inject).
    """

    SHARED_SCOPE = "shared_image_embedding"

    def __init__(self, input_shape, hp, *, enable_shared_block: bool = True,
                 freeze_shared: bool = False, **kw):
        self.enable_shared_block = enable_shared_block
        self.freeze_shared = freeze_shared
        self._shared = SharedImageEmbedding(dtype=kw.get("dtype"), name=self.SHARED_SCOPE)
        super().__init__(input_shape, hp, **kw)

    def _ctor_options(self):
        return dict(super()._ctor_options(),
                    enable_shared_block=self.enable_shared_block,
                    freeze_shared=self.freeze_shared)

    def init(self, rng, batch_size: int = 1):
        if not self.enable_shared_block:
            return super().init(rng, batch_size)
        if not hasattr(rng, "shape"):
            rng = jax.random.PRNGKey(int(rng))
        x = self.dummy_input(batch_size)
        sv = self._shared.init(jax.random.fold_in(rng, 7), x)
        emb = self._shared.apply(sv, x)
        x2 = jnp.concatenate([x, dnn.interpolate(emb, x.shape[1:-1])], axis=-1)
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = self.module.init(rngs, x2, train=False)
        v = dict(variables)
        v["params"] = dict(v["params"])
        v["params"][self.SHARED_SCOPE] = sv["params"]
        return v

    def apply(self, variables, x, *, train: bool = False, rngs=None, mutable=None):
        if not self.enable_shared_block:
            return super().apply(variables, x, train=train, rngs=rngs, mutable=mutable)
        shared_params = variables["params"][self.SHARED_SCOPE]
        emb = self._shared.apply({"params": shared_params}, x, train=train)
        # concat embedding with raw input along channels (reference forward
        # concat at channel dim, base_module.py:285-289)
        emb = dnn.interpolate(emb, x.shape[1:-1])
        x2 = jnp.concatenate([x, emb], axis=-1)
        rest = {k: (dict(v) if k != "params" else
                    {n: p for n, p in v.items() if n != self.SHARED_SCOPE})
                for k, v in variables.items()}
        return super().apply(rest, x2, train=train, rngs=rngs, mutable=mutable)

    def dummy_input(self, batch_size: int = 1, dtype=jnp.float32):
        return jnp.zeros((batch_size, *self.input_shape), dtype=dtype)

    def _dag_input(self, batch_size: int = 1):
        if not self.enable_shared_block:
            return self.dummy_input(batch_size)
        h, w, c = self.input_shape
        return jnp.zeros((batch_size, h, w, c + self._shared.features[-1]),
                         jnp.float32)

    def extract_shared_params(self, variables):
        return variables["params"][self.SHARED_SCOPE]

    @classmethod
    def inject_shared_params(cls, variables, shared_params):
        v = dict(variables)
        v["params"] = dict(v["params"])
        v["params"][cls.SHARED_SCOPE] = shared_params
        return v

    def frozen_mask(self, variables):
        """optax-compatible mask pytree: True = frozen (zero-update) leaves."""
        def mark(path_has_shared, tree):
            return jax.tree_util.tree_map(lambda _: path_has_shared, tree)
        params = variables["params"]
        return {k: mark(self.freeze_shared and k == self.SHARED_SCOPE, v)
                for k, v in params.items()}



if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
