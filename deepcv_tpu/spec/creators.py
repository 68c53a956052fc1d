"""Submodule-creator registry + built-in creators.

Reference parity: /root/reference/src/deepcv/meta/submodule_creators.py.
A *creator* maps a YAML spec entry (name + params) to either:
  * a flax module (conv/linear/pool/... — usually wrapped in
    :class:`deepcv_tpu.ops.nn.Layer`), or
  * a :class:`ForwardCallback` — a pure function over (current tensor,
    referenced submodule outputs); the mechanism behind residual/dense links,
    tensor selection and new branches (reference ForwardCallbackSubmodule,
    submodule_creators.py:85-128).

Global-vs-local param merge: hp entries named in a creator's
``global_keys`` (act_fn, dropout_prob, preactivation + every norm technique)
are auto-forwarded to the creator, local spec params win
(reference nn_spec.py:115-118, 172-182).

Reference public-name typos (``transosed_conv2d``) are registered as aliases
of the corrected names (SURVEY §8 API-surface decision).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as fnn

from deepcv_tpu.ops import nn as dnn
from deepcv_tpu.spec.tokens import YamlTokens
from deepcv_tpu.utils import parse_slice

__all__ = [
    "CreatorContext", "ForwardCallback", "submodule_creator", "get_creator",
    "BASIC_SUBMODULE_CREATORS", "TENSOR_REDUCTION_FNS", "get_reduction_fn",
    "AvgPool", "MaxPool", "creator_global_keys",
]

# --------------------------------------------------------------------------- #
# Reductions (reference submodule_creators.py:43-79)
# --------------------------------------------------------------------------- #

def _reduce_concat(tensors: Sequence[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    return jnp.concatenate(list(tensors), axis=axis)


def _reduce_sum(tensors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    out = tensors[0]
    for t in tensors[1:]:
        out = out + t
    return out


def _reduce_mean(tensors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return _reduce_sum(tensors) / float(len(tensors))


def _reduce_none(tensors: Sequence[jnp.ndarray]):
    return list(tensors)


TENSOR_REDUCTION_FNS: Dict[str, Callable] = {
    "concat": _reduce_concat,
    "sum": _reduce_sum,
    "mean": _reduce_mean,
    "none": _reduce_none,
}


def get_reduction_fn(name_or_fn: Union[str, Callable, None], default: str = "concat") -> Callable:
    if name_or_fn is None:
        name_or_fn = default
    if callable(name_or_fn):
        return name_or_fn
    if name_or_fn not in TENSOR_REDUCTION_FNS:
        raise ValueError(f"Unknown reduction '{name_or_fn}', expected {list(TENSOR_REDUCTION_FNS)}")
    return TENSOR_REDUCTION_FNS[name_or_fn]


# --------------------------------------------------------------------------- #
# Creator protocol
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class CreatorContext:
    """Build-time context handed to creators (reference 'special args'
    SUBM_CREATOR_SPECIAL_ARGS, base_module.py:74 — shapes are NOT needed here
    because flax infers input features lazily)."""
    hp: Mapping[str, Any]                      # global model hyperparameters
    dtype: Any = None                          # compute dtype (None => float32)
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None            # data-parallel axis for sync BN
    submodule_names: Tuple[str, ...] = ()      # names defined so far
    nas_mode: str = "fixed"                    # 'fixed' | 'supernet'
    nas_arch: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    conv_spatial_rank: int = 2                 # inferred from input rank by DeepcvModule
    # global weight reparameterizations (reference base_module.py:106-111):
    weight_norm: Optional[Mapping[str, Any]] = None
    spectral_norm: Optional[Mapping[str, Any]] = None
    # 'int8' => conv/dense compute in w8a8 on the MXU's int8 path (inference;
    # params stay float so trained checkpoints load unchanged);
    # 'int8_qat' (or 'int<N>_qat') => fake-quant + straight-through training
    quantize: Optional[str] = None
    # node_path -> static activation scale from compression.calibrate_int8_scales
    # (removes the per-call amax pass; absent nodes quantize dynamically).
    # Keys are FULL paths 'nested/local' — see `scope`.
    quantize_scales: Mapping[str, float] = dataclasses.field(default_factory=dict)
    # nesting prefix ('<nested_name>/...') so per-path scale keys resolve
    scope: str = ""


@dataclasses.dataclass
class ForwardCallback:
    """A parameter-free graph node applied to (x, referenced outputs).

    ``fn(x, refs) -> tensor-or-list``. ``uses_current=False`` means x is
    ignored (``_new_branch_from_tensor``). ``apply_in_parallel`` zips the
    callback over parallel streams (HRNet multi-stream links,
    conf/base/parameters.yml:64-76).
    """
    fn: Callable[[Any, List[jnp.ndarray]], Any]
    referenced_submodules: Tuple[str, ...] = ()
    uses_current: bool = True
    apply_in_parallel: bool = False
    input_choice: Optional[Dict[str, Any]] = None  # NAS input choice spec

    def __call__(self, x, refs):
        if self.apply_in_parallel and isinstance(x, (list, tuple)):
            streams = []
            for i, xi in enumerate(x):
                refs_i = []
                for r in refs:
                    if isinstance(r, (list, tuple)):
                        if i < len(r):      # ref has fewer streams: skip missing
                            refs_i.append(r[i])
                    else:
                        refs_i.append(r)
                streams.append(self.fn(xi, refs_i))
            return streams
        return self.fn(x, refs)


#: global hp keys auto-forwarded to layer-producing creators
GLOBAL_LAYER_KEYS = ("act_fn", "dropout_prob", "preactivation") + dnn.NormTechnique.ALL

_CREATORS: Dict[str, Dict[str, Any]] = {}


def submodule_creator(name: str, *, aliases: Sequence[str] = (),
                      global_keys: Sequence[str] = (),
                      allowed: Optional[Sequence[str]] = None,
                      required: Sequence[str] = ()):
    """Register a submodule creator (reference ``submodule_creator_dec``,
    submodule_creators.py:133-160, incl. allowed/required param validation)."""
    def dec(fn):
        entry = {"fn": fn, "global_keys": tuple(global_keys),
                 "allowed": tuple(allowed) if allowed is not None else None,
                 "required": tuple(required)}
        _CREATORS[name] = entry
        for a in aliases:
            _CREATORS[a] = entry
        return fn
    return dec


def get_creator(name: str) -> Optional[Dict[str, Any]]:
    return _CREATORS.get(name)


def creator_global_keys(name: str) -> Tuple[str, ...]:
    e = _CREATORS.get(name)
    return e["global_keys"] if e else ()


def check_creator_params(name: str, params: Mapping[str, Any]):
    """Validate spec params against the creator's allowed/required sets
    (reference ``_check_submodule_params``, submodule_creators.py:146-158)."""
    e = _CREATORS[name]
    keys = {k for k in params if not k.startswith("_")}
    if e["allowed"] is not None:
        extra = keys - set(e["allowed"]) - set(e["global_keys"])
        if extra:
            raise ValueError(f"Submodule creator '{name}': unexpected param(s) {sorted(extra)}; "
                             f"allowed: {sorted(set(e['allowed']) | set(e['global_keys']))}")
    missing = [k for k in e["required"] if params.get(k, None) is None]
    if missing:
        raise ValueError(f"Submodule creator '{name}': missing required param(s) {missing}")


BASIC_SUBMODULE_CREATORS = _CREATORS  # reference name parity


# --------------------------------------------------------------------------- #
# Pooling modules
# --------------------------------------------------------------------------- #

class AvgPool(fnn.Module):
    kernel_size: Tuple[int, ...] = (2, 2)
    stride: Optional[Tuple[int, ...]] = None
    padding: Any = 0

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return dnn.avg_pool_nd(x, self.kernel_size, self.stride, self.padding)


class MaxPool(fnn.Module):
    kernel_size: Tuple[int, ...] = (2, 2)
    stride: Optional[Tuple[int, ...]] = None
    padding: Any = 0

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return dnn.max_pool_nd(x, self.kernel_size, self.stride, self.padding)


# --------------------------------------------------------------------------- #
# Layer-unit creator helpers
# --------------------------------------------------------------------------- #

def _norm_specs_from_params(params: Mapping[str, Any]) -> Dict[str, Any]:
    return {t: params[t] for t in dnn.NormTechnique.ALL
            if params.get(t) not in (None, False) and t in params}


def _as_layer(op: fnn.Module, params: Mapping[str, Any], ctx: CreatorContext,
              name: Optional[str] = None, act_in_op: bool = False) -> fnn.Module:
    """Wrap an op into the reference ``layer()`` unit with act/norm/dropout.

    Global weight reparameterizations (hp 'spectral_norm' / 'weight_norm',
    reference base_module.py:106-111) wrap the op's weights.
    """
    if ctx.spectral_norm:
        sn = dict(ctx.spectral_norm)
        op = fnn.SpectralNorm(op, n_steps=int(sn.get("n_power_iterations", 1)),
                              epsilon=float(sn.get("eps", 1e-12)),
                              error_on_non_matrix=False)
    elif ctx.weight_norm:
        wn = dict(ctx.weight_norm)
        op = fnn.WeightNorm(op, epsilon=float(wn.get("eps", 1e-12)))
    act = dnn.get_activation(params.get("act_fn"))
    return dnn.Layer(
        op=op, act_fn=act,
        dropout_prob=float(params.get("dropout_prob") or 0.0),
        preactivation=bool(params.get("preactivation", False)),
        norms=tuple(dnn.normalization_techniques(
            _norm_specs_from_params(params), dtype=ctx.dtype, axis_name=ctx.axis_name)),
        act_in_op=act_in_op,
        name=name)


def _qat_bits(quantize: Optional[str]) -> Optional[int]:
    """'int8_qat' -> 8, 'int4_qat' -> 4, anything else -> None."""
    if not quantize:
        return None
    m = re.fullmatch(r"int(\d+)_qat", str(quantize))
    return int(m.group(1)) if m else None


def _conv_common(params: Mapping[str, Any], rank: int):
    ks = params["kernel_size"]
    ks = tuple(ks) if isinstance(ks, (list, tuple)) else (int(ks),) * rank
    strides = params.get("stride", params.get("strides", 1))
    strides = tuple(strides) if isinstance(strides, (list, tuple)) else (int(strides),) * len(ks)
    pad = params.get("padding", None)
    if pad is None:
        pad = dnn.get_padding_from_kernel(ks)  # auto 'same' (reference :246-247)
    if isinstance(pad, str):
        padding = pad.upper()
    else:
        pads = tuple(pad) if isinstance(pad, (list, tuple)) else (int(pad),) * len(ks)
        padding = tuple((int(p), int(p)) for p in pads)
    dilation = params.get("dilation", 1)
    dilation = tuple(dilation) if isinstance(dilation, (list, tuple)) else (int(dilation),) * len(ks)
    return ks, strides, padding, dilation


_CONV_ALLOWED = ("kernel_size", "out_channels", "padding", "stride", "strides",
                 "dilation", "groups", "use_bias", "bias", "output_padding")


def _make_conv_creator(rank: int, transpose: bool):
    def creator(params: Mapping[str, Any], ctx: CreatorContext, name: str) -> fnn.Module:
        ks, strides, padding, dilation = _conv_common(params, rank)
        gain = dnn.get_gain(params.get("act_fn"))
        # reference inits CONV weights with xavier_normal_ (base_module.py:247-249)
        kinit = dnn.xavier_normal_with_gain(gain)
        use_bias = bool(params.get("use_bias", params.get("bias", True)))
        out_ch = int(params["out_channels"])

        # fused Pallas conv path: plain stride-1 'same' 2D convs without
        # groups/dilation/weight-reparam; activation fuses into the kernel
        # epilogue in post-activation order (falls back to XLA at call time
        # when the channel regime doesn't qualify — see pallas.supports)
        from deepcv_tpu.ops.pallas import fused_layer as PF
        same_pad = (not isinstance(padding, str)
                    and tuple(padding) == tuple((k // 2, k // 2) for k in ks))
        plain = (not transpose and rank == 2 and int(params.get("groups", 1)) == 1
                 and tuple(strides) == (1, 1) and tuple(dilation) == (1, 1)
                 and same_pad and all(k % 2 == 1 for k in ks)
                 and not ctx.spectral_norm and not ctx.weight_norm
                 and not ctx.quantize
                 and PF.pallas_convs_enabled())
        if plain:
            preact = bool(params.get("preactivation", False))
            act = dnn.get_activation(params.get("act_fn"))
            op = PF.PallasConv(features=out_ch, kernel_size=tuple(ks),
                               act_fn=None if preact else act,
                               use_bias=use_bias, dtype=ctx.dtype,
                               param_dtype=ctx.param_dtype, kernel_init=kinit,
                               name=f"{name}_op")
            return _as_layer(op, params, ctx, name=name, act_in_op=not preact)
        common = dict(features=out_ch, kernel_size=ks,
                      strides=strides, padding=padding,
                      use_bias=use_bias,
                      dtype=ctx.dtype, param_dtype=ctx.param_dtype, kernel_init=kinit,
                      name=f"{name}_op")
        if transpose:
            # torch-semantics transpose (flax's ConvTranspose is a different
            # operator — shapes and values diverge, see ops.nn); no int8
            # path (no conv injection point); stays in the float dtype
            if isinstance(padding, str):
                raise ValueError(
                    f"Submodule '{name}': transposed convs take integer "
                    "padding (torch semantics), not 'SAME'/'VALID'")
            if int(params.get("groups", 1)) != 1:
                raise NotImplementedError(
                    f"Submodule '{name}': grouped transposed convolutions "
                    "are not implemented (silently ignoring 'groups' would "
                    "build a different layer than torch's)")
            op = dnn.ConvTransposeTorch(
                features=common["features"], kernel_size=common["kernel_size"],
                strides=common["strides"], padding=padding,
                output_padding=params.get("output_padding", 0),
                kernel_dilation=dilation, use_bias=common["use_bias"],
                dtype=common["dtype"], param_dtype=common["param_dtype"],
                kernel_init=common["kernel_init"], name=common["name"])
        else:
            if ctx.quantize == "int8":
                import functools
                from deepcv_tpu.compression import int8_conv_general_dilated
                common["conv_general_dilated"] = functools.partial(
                    int8_conv_general_dilated,
                    act_scale=ctx.quantize_scales.get(ctx.scope + name))
            elif _qat_bits(ctx.quantize):
                import functools
                from deepcv_tpu.compression import fake_quant_conv_general_dilated
                common["conv_general_dilated"] = functools.partial(
                    fake_quant_conv_general_dilated,
                    act_scale=ctx.quantize_scales.get(ctx.scope + name),
                    bits=_qat_bits(ctx.quantize))
            if params.get("output_padding"):
                raise ValueError(
                    f"Submodule '{name}': 'output_padding' only applies to "
                    "transposed convolutions")
            op = fnn.Conv(kernel_dilation=dilation,
                          feature_group_count=int(params.get("groups", 1)), **common)
        return _as_layer(op, params, ctx, name=name)
    return creator


for _r in (1, 2, 3):
    submodule_creator(f"conv{_r}d", global_keys=GLOBAL_LAYER_KEYS,
                      allowed=_CONV_ALLOWED, required=("kernel_size", "out_channels"),
                      )(_make_conv_creator(_r, transpose=False))
    # corrected spelling + reference-typo alias ('transosed_convNd',
    # submodule_creators.py:265-267)
    submodule_creator(f"transposed_conv{_r}d",
                      aliases=(f"transosed_conv{_r}d", f"conv_transpose{_r}d"),
                      global_keys=GLOBAL_LAYER_KEYS,
                      allowed=_CONV_ALLOWED, required=("kernel_size", "out_channels"),
                      )(_make_conv_creator(_r, transpose=True))


@submodule_creator("fully_connected", aliases=("linear",), global_keys=GLOBAL_LAYER_KEYS,
                   allowed=("out_features", "use_bias", "bias", "flatten_input"))
def _fully_connected(params: Mapping[str, Any], ctx: CreatorContext, name: str) -> fnn.Module:
    out_features = params.get("out_features")
    if out_features is None:
        raise ValueError(
            f"Submodule '{name}' (fully_connected): 'out_features' unresolved. Task pipelines "
            "inject it from dataset metadata (reference classification/image.py:40-53); "
            "set it explicitly for standalone use.")
    gain = dnn.get_gain(params.get("act_fn"))
    extra = {}
    dg = _quantized_dot_general(ctx, name)
    if dg is not None:
        extra["dot_general"] = dg
    op = fnn.Dense(features=int(out_features),
                   use_bias=bool(params.get("use_bias", params.get("bias", True))),
                   dtype=ctx.dtype, param_dtype=ctx.param_dtype,
                   kernel_init=dnn.xavier_uniform_with_gain(gain),
                   name=f"{name}_op", **extra)
    if params.get("flatten_input"):
        # collapse all non-batch dims before the dense op (otherwise Dense
        # acts per-pixel on the channel dim and the flag silently no-ops)
        op = dnn.FlattenThen(inner=op, name=f"{name}_flatten")
    return _as_layer(op, params, ctx, name=name)


def _pool_params(params):
    ks = tuple(params["kernel_size"])
    stride = params.get("stride")
    stride = tuple(stride) if stride is not None else None
    return ks, stride, params.get("padding", 0)


@submodule_creator("average_pooling", aliases=("avg_pooling", "avg_pool"),
                   allowed=("kernel_size", "stride", "padding"), required=("kernel_size",))
def _avg_pooling(params, ctx: CreatorContext, name: str) -> fnn.Module:
    ks, stride, pad = _pool_params(params)
    return AvgPool(kernel_size=ks, stride=stride, padding=pad, name=name)


@submodule_creator("max_pooling", aliases=("max_pool",),
                   allowed=("kernel_size", "stride", "padding"), required=("kernel_size",))
def _max_pooling(params, ctx: CreatorContext, name: str) -> fnn.Module:
    ks, stride, pad = _pool_params(params)
    return MaxPool(kernel_size=ks, stride=stride, padding=pad, name=name)


@submodule_creator("flatten", allowed=())
def _flatten(params, ctx: CreatorContext, name: str) -> fnn.Module:
    return dnn.Flatten(name=name)


@submodule_creator("activation", aliases=("act",), global_keys=("act_fn",),
                   allowed=("act_fn",))
def _activation(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Bare activation node — e.g. the post-sum ReLU of a residual block
    (spec zoo ResNet builder)."""
    return dnn.Layer(op=dnn.Identity(name=f"{name}_op"),
                     act_fn=dnn.get_activation(params.get("act_fn")),
                     name=name)


@submodule_creator("blur_curriculum",
                   allowed=("kernel_size", "init_sigma", "min_sigma",
                            "decay_steps", "schedule"))
def _blur_curriculum(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Annealed Gaussian blur on the activations flowing through this node
    (reference README.md:128 TODO — coarse-to-fine training curriculum).
    Place after any conv: ``- blur_curriculum: {init_sigma: 2.0,
    decay_steps: 2000}``."""
    sched = str(params.get("schedule", "cosine"))
    if sched not in ("cosine", "linear", "exponential"):
        raise ValueError(f"blur_curriculum schedule must be cosine|linear|"
                        f"exponential, got {sched!r} (node '{name}')")
    k = int(params.get("kernel_size", 5))
    if k % 2 == 0 or k < 3:
        raise ValueError(f"blur_curriculum kernel_size must be odd >= 3, "
                        f"got {k} (node '{name}')")
    return dnn.BlurCurriculum(kernel_size=k,
                              init_sigma=float(params.get("init_sigma", 2.0)),
                              min_sigma=float(params.get("min_sigma", 0.0)),
                              decay_steps=int(params.get("decay_steps", 1000)),
                              schedule=sched, dtype=ctx.dtype, name=name)


@submodule_creator("convnext_stem", allowed=("dim", "patch", "ln_eps"),
                   required=("dim",))
def _convnext_stem(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """ConvNeXt patchify stem (reshape + Dense + LN; arXiv:2201.03545)."""
    return dnn.ConvNeXtStem(dim=int(params["dim"]),
                            patch=int(params.get("patch", 4)),
                            ln_eps=float(params.get("ln_eps", 1e-6)),
                            dtype=ctx.dtype, name=name)


@submodule_creator("convnext_downsample", allowed=("dim", "ln_eps"),
                   required=("dim",))
def _convnext_downsample(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """ConvNeXt between-stage LN + 2x2/s2 conv."""
    return dnn.ConvNeXtDownsample(dim=int(params["dim"]),
                                  ln_eps=float(params.get("ln_eps", 1e-6)),
                                  dtype=ctx.dtype, name=name)


@submodule_creator("convnext_block",
                   allowed=("drop_path_prob", "layer_scale_init", "ln_eps",
                            "norm"))
def _convnext_block(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """ConvNeXt block: dw7x7 -> LN (or rms_norm) -> 4C MLP (exact GELU) ->
    layer scale -> drop path -> residual."""
    return dnn.ConvNeXtBlock(
        drop_path_prob=float(params.get("drop_path_prob") or 0.0),
        layer_scale_init=float(params.get("layer_scale_init", 1e-6)),
        ln_eps=float(params.get("ln_eps", 1e-6)),
        norm=str(params.get("norm", "layer_norm")),
        dtype=ctx.dtype, name=name)


@submodule_creator("fpn", aliases=("feature_pyramid",),
                   allowed=("channels", "head_outputs"))
def _fpn(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Feature Pyramid Network over a gathered list of backbone levels
    (ops/nn.FeaturePyramid). ``head_outputs`` adds the RetinaNet-style
    shared head conv and emits the flat (N, T_total, head_outputs) dense
    prediction tensor."""
    return dnn.FeaturePyramid(channels=int(params.get("channels", 64)),
                              head_outputs=int(params.get("head_outputs", 0)),
                              dtype=ctx.dtype, name=name)


@submodule_creator("interpolate", aliases=("upsample", "resize"),
                   allowed=("size", "scale", "method"))
def _interpolate(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Spatial resize node (decoder/segmentation upsampling): explicit
    ``size: [h, w]`` or ``scale: k`` (reference interpolate semantics,
    nn.py:665-676, as a standalone spec node)."""
    size = params.get("size")
    return dnn.Interpolate(size=tuple(int(s) for s in size) if size else None,
                           scale=float(params.get("scale") or 0.0),
                           method=str(params.get("method", "linear")),
                           name=name)


@submodule_creator("concat_coords", allowed=())
def _concat_coords(params, ctx: CreatorContext, name: str) -> fnn.Module:
    return dnn.ConcatCoords(name=name)


@submodule_creator("concat_hilbert_coords", allowed=())
def _concat_hilbert(params, ctx: CreatorContext, name: str) -> fnn.Module:
    return dnn.ConcatHilbertCoords(name=name)


# --------------------------------------------------------------------------- #
# Callback creators: links, reduce, select, new-branch
# --------------------------------------------------------------------------- #

def _maybe_rescale(ref: jnp.ndarray, like: jnp.ndarray, allow_scaling: bool,
                   name: str) -> jnp.ndarray:
    if ref.shape[1:-1] != like.shape[1:-1]:
        if not allow_scaling:
            raise ValueError(
                f"Link '{name}': referenced output spatial shape {ref.shape[1:-1]} != current "
                f"{like.shape[1:-1]} and allow_scaling=False (reference submodule_creators.py:300-323)")
        ref = dnn.interpolate(ref, like.shape[1:-1])
    return ref


@submodule_creator("residual_link", aliases=("add_link",),
                   allowed=("allow_scaling", "reduction", "apply_in_parallel",
                            "scaling_mode", YamlTokens.FROM, YamlTokens.FROM_NAS_INPUT_CHOICE))
def _residual_link(params, ctx: CreatorContext, name: str) -> ForwardCallback:
    allow_scaling = bool(params.get("allow_scaling", False))
    reduction = get_reduction_fn(params.get("reduction"), default="sum")

    def fn(x, refs):
        if not refs:
            return x  # stream has no matching ref stream (parallel HRNet links)
        refs = [_maybe_rescale(r, x, allow_scaling, name) for r in refs]
        combined = reduction(refs) if len(refs) > 1 else refs[0]
        if combined.shape[-1] != x.shape[-1]:
            raise ValueError(
                f"residual_link '{name}': channel mismatch {combined.shape[-1]} vs "
                f"{x.shape[-1]} — residual refs must preserve channel count (only "
                "spatial rescaling is supported, reference submodule_creators.py:272-332)")
        return x + combined.astype(x.dtype)

    return ForwardCallback(fn=fn, apply_in_parallel=bool(params.get("apply_in_parallel", False)))


@submodule_creator("dense_link", aliases=("concat_link",),
                   allowed=("allow_scaling", "reduction", "apply_in_parallel",
                            "scaling_mode", YamlTokens.FROM, YamlTokens.FROM_NAS_INPUT_CHOICE))
def _dense_link(params, ctx: CreatorContext, name: str) -> ForwardCallback:
    allow_scaling = bool(params.get("allow_scaling", False))

    def fn(x, refs):
        if not refs:
            return x
        refs = [_maybe_rescale(r, x, allow_scaling, name).astype(x.dtype) for r in refs]
        return jnp.concatenate([x, *refs], axis=-1)

    return ForwardCallback(fn=fn, apply_in_parallel=bool(params.get("apply_in_parallel", False)))


@submodule_creator(YamlTokens.NEW_BRANCH_FROM_TENSOR, aliases=("new_branch_from_tensor",),
                   allowed=("reduction", YamlTokens.FROM, YamlTokens.FROM_NAS_INPUT_CHOICE))
def _new_branch(params, ctx: CreatorContext, name: str) -> ForwardCallback:
    """Start a new branch from referenced output(s), discarding current tensor
    (reference submodule_creators.py:203-224; used for siamese branches,
    parameters.yml:47)."""
    reduction = get_reduction_fn(params.get("reduction"), default="none")

    def fn(x, refs):
        out = reduction(refs) if len(refs) > 1 else refs[0]
        return out

    return ForwardCallback(fn=fn, uses_current=False)


@submodule_creator("reduce", allowed=("reduction",), required=("reduction",))
def _reduce(params, ctx: CreatorContext, name: str) -> ForwardCallback:
    reduction = get_reduction_fn(params["reduction"])

    def fn(x, refs):
        tensors = list(x) if isinstance(x, (list, tuple)) else [x]
        return reduction(tensors)

    return ForwardCallback(fn=fn)


@submodule_creator("select_tensor", allowed=("slice", "index"))
def _select_tensor(params, ctx: CreatorContext, name: str) -> ForwardCallback:
    """Select a slice of the current tensor list
    (reference submodule_creators.py:189-200)."""
    sl = parse_slice(params.get("slice", params.get("index", ":")))

    def fn(x, refs):
        if not isinstance(x, (list, tuple)):
            x = [x]
        out = list(x)[sl]
        return out[0] if len(out) == 1 else out

    return ForwardCallback(fn=fn)


# --------------------------------------------------------------------------- #
# HRNet creators (reference hrnet.py entries in BASIC_SUBMODULE_CREATORS)
# --------------------------------------------------------------------------- #

def _hrnet_common(params: Mapping[str, Any], ctx: CreatorContext):
    return dict(act_fn=dnn.get_activation(params.get("act_fn")),
                dtype=ctx.dtype)


@submodule_creator("hrnet_input_stem", global_keys=GLOBAL_LAYER_KEYS,
                   allowed=("out_channels", "conv_count"), required=("out_channels",))
def _hrnet_stem(params, ctx: CreatorContext, name: str) -> fnn.Module:
    from deepcv_tpu.ops import hrnet as H
    return H.HRNetInputStem(out_channels=int(params["out_channels"]),
                            conv_count=int(params.get("conv_count", 2)),
                            act_fn=dnn.get_activation(params.get("act_fn")),
                            norm_specs=_norm_specs_from_params(params),
                            dropout_prob=float(params.get("dropout_prob") or 0.0),
                            preactivation=bool(params.get("preactivation", False)),
                            dtype=ctx.dtype, name=name)


@submodule_creator("parallel_conv", aliases=("parallel_convolution",),
                   global_keys=GLOBAL_LAYER_KEYS,
                   allowed=("kernel_size", "out_channels", "groups"),
                   required=("kernel_size", "out_channels"))
def _parallel_conv(params, ctx: CreatorContext, name: str) -> fnn.Module:
    from deepcv_tpu.ops import hrnet as H

    def to_tuple(v):
        if isinstance(v, (list, tuple)):
            return tuple(to_tuple(e) for e in v)
        return v

    return H.ParallelConvolution(kernel_size=to_tuple(params["kernel_size"]),
                                 out_channels=to_tuple(params["out_channels"]),
                                 groups=to_tuple(params.get("groups", 1)),
                                 act_fn=dnn.get_activation(params.get("act_fn")),
                                 dropout_prob=float(params.get("dropout_prob") or 0.0),
                                 preactivation=bool(params.get("preactivation", False)),
                                 norm_specs=_norm_specs_from_params(params),
                                 dtype=ctx.dtype, name=name)


@submodule_creator("pyconv", aliases=("pyramidal_conv",),
                   global_keys=GLOBAL_LAYER_KEYS,
                   allowed=("kernel_sizes", "out_channels", "groups"),
                   required=("kernel_sizes", "out_channels"))
def _pyconv(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Pyramidal convolution (PyConv, arXiv:2006.11538) — the reference
    README TODO :147 intent: several kernel sizes over ONE input with
    cost-balancing convolution groups, outputs channel-concatenated.
    ``groups`` omitted -> the paper's (K_i/K_0)^2 power-of-two scheme."""
    from deepcv_tpu.ops import hrnet as H
    g = params.get("groups")
    return H.PyramidalConvolution(
        kernel_sizes=tuple(tuple(k) if isinstance(k, (list, tuple)) else int(k)
                           for k in params["kernel_sizes"]),
        out_channels=(tuple(int(c) for c in params["out_channels"])
                      if isinstance(params["out_channels"], (list, tuple))
                      else int(params["out_channels"])),
        groups=(tuple(int(v) for v in g) if isinstance(g, (list, tuple))
                else (int(g) if g is not None else None)),
        act_fn=dnn.get_activation(params.get("act_fn")),
        dropout_prob=float(params.get("dropout_prob") or 0.0),
        preactivation=bool(params.get("preactivation", False)),
        norm_specs=_norm_specs_from_params(params),
        dtype=ctx.dtype, name=name)


@submodule_creator("multiresolution_fusion", global_keys=GLOBAL_LAYER_KEYS,
                   allowed=("create_new_branch", "new_branch_channels",
                            "reuse_scaling_convs"))
def _multires_fusion(params, ctx: CreatorContext, name: str) -> fnn.Module:
    from deepcv_tpu.ops import hrnet as H
    nb = params.get("new_branch_channels")
    return H.MultiresolutionFusion(
        create_new_branch=bool(params.get("create_new_branch", True)),
        new_branch_channels=int(nb) if nb else None,
        reuse_scaling_convs=bool(params.get("reuse_scaling_convs", False)),
        act_fn=dnn.get_activation(params.get("act_fn")),
        dtype=ctx.dtype, name=name)


def _make_head_creator(version: str):
    def creator(params, ctx: CreatorContext, name: str) -> fnn.Module:
        from deepcv_tpu.ops import hrnet as H
        common = dict(name=name)
        if version == "v1":
            return H.HRNetV1RepresentationHead(**common)
        act = dnn.get_activation(params.get("act_fn"))
        oc = params.get("out_channels")
        if version == "v2":
            return H.HRNetV2RepresentationHead(out_channels=int(oc) if oc else None,
                                               act_fn=act, dtype=ctx.dtype, **common)
        return H.HRNetV2pRepresentationHead(out_channels=int(oc) if oc else None,
                                            pyramid_levels=int(params.get(
                                                "pyramid_levels", 3)),
                                            act_fn=act, dtype=ctx.dtype, **common)
    return creator


submodule_creator("hrnet_repr_head_v1", global_keys=GLOBAL_LAYER_KEYS,
                  allowed=())(_make_head_creator("v1"))
# the reference YAML writes 'hrnet_repr_head_vZ' (parameters.yml:77) — alias of v2
submodule_creator("hrnet_repr_head_v2", aliases=("hrnet_repr_head_vZ",),
                  global_keys=GLOBAL_LAYER_KEYS,
                  allowed=("out_channels",))(_make_head_creator("v2"))
submodule_creator("hrnet_repr_head_v2p", global_keys=GLOBAL_LAYER_KEYS,
                  allowed=("out_channels", "pyramid_levels"))(_make_head_creator("v2p"))



@submodule_creator("squeeze_cell", aliases=("squeeze_excitation", "se_cell"),
                   global_keys=("act_fn",),
                   allowed=("reduction_ratio", "hidden_channels", "gate_fn"))
def _squeeze_cell(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """SE attention cell (working version of the reference squeeze_cell stub,
    nn.py:557-582). ``hidden_channels`` pins the squeeze width exactly
    (MobileNetV3's multiple-of-8 rounding); ``gate_fn`` swaps the sigmoid
    gate (e.g. 'hard_sigmoid')."""
    return dnn.SqueezeExcitation(
        reduction_ratio=int(params.get("reduction_ratio", 4)),
        act_fn=dnn.get_activation(params.get("act_fn")),
        hidden_channels=int(params.get("hidden_channels", 0)),
        gate_fn=dnn.get_activation(params.get("gate_fn")),
        dtype=ctx.dtype, name=name)


@submodule_creator("smg_module", aliases=("hcgn_block",),
                   global_keys=("act_fn",),
                   allowed=("out_channels", "growth_rate", "layers",
                            "reduction_ratio"),
                   required=("out_channels",))
def _smg_module(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """HCGN SMG module (arXiv:1908.09699) — the reference's unimplemented
    `smg_module` creator (nn.py:93-125): dense connectivity inside, SE
    gating, gated residual across the module boundary."""
    return dnn.SMGModule(
        out_channels=int(params["out_channels"]),
        growth_rate=int(params.get("growth_rate", 16)),
        layers=int(params.get("layers", 3)),
        reduction_ratio=int(params.get("reduction_ratio", 4)),
        act_fn=dnn.get_activation(params.get("act_fn")),
        dtype=ctx.dtype, name=name)


@submodule_creator("eca", aliases=("efficient_channel_attention",),
                   allowed=("kernel_size", "gamma", "beta"))
def _eca_cell(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """ECA channel-attention gate (arXiv:1910.03151) — the reference README's
    explicit ECA TODO (/root/reference/README.md:154). ``kernel_size: 0``
    (default) picks the paper's adaptive odd size from the channel count."""
    return dnn.EfficientChannelAttention(
        kernel_size=int(params.get("kernel_size", 0)),
        gamma=float(params.get("gamma", 2.0)),
        beta=float(params.get("beta", 1.0)),
        dtype=ctx.dtype, name=name)


@submodule_creator("resnet_net_block", aliases=("resnet_block",),
                   global_keys=("act_fn",),
                   allowed=("out_channels", "kernel_size", "stride", "num_groups"),
                   required=("out_channels",))
def _resnet_block(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Residual block (working version of the reference resnet_net_block stub,
    nn.py:557-582)."""
    ks = params.get("kernel_size", [3, 3])
    act = dnn.get_activation(params.get("act_fn")) or __import__("jax").nn.relu
    return dnn.ResNetBlock(out_channels=int(params["out_channels"]),
                           kernel_size=tuple(int(v) for v in ks),
                           stride=int(params.get("stride", 1)),
                           act_fn=act,
                           num_groups=int(params.get("num_groups", 8)),
                           dtype=ctx.dtype, name=name)


@submodule_creator("conv_with_meta_layer", aliases=("meta_layer_conv",),
                   global_keys=("act_fn",),
                   allowed=("out_channels", "kernel_size", "meta_hidden"),
                   required=("out_channels",))
def _conv_with_meta_layer(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """FiLM-modulated conv (working version of the reference
    ConvWithMetaLayer stub, nn.py:51-67)."""
    ks = params.get("kernel_size", [3, 3])
    act = dnn.get_activation(params.get("act_fn"))
    return dnn.ConvWithMetaLayer(features=int(params["out_channels"]),
                                 kernel_size=tuple(int(v) for v in ks),
                                 meta_hidden=int(params.get("meta_hidden", 32)),
                                 act_fn=act, dtype=ctx.dtype, name=name)
# --------------------------------------------------------------------------- #
# Transformer creators (beyond the CNN-only reference — SURVEY §5.7 records
# "no attention anywhere in repo"; these expose ops/attention.py through the
# same YAML spec language so the ViT zoo family is plain spec dicts too)
# --------------------------------------------------------------------------- #

def _quantized_dot_general(ctx: CreatorContext, name: str,
                           subs: Sequence[str] = ()):
    """The int8 / fake-quant dot override for a node's Dense projections.

    Without ``subs``: one callable bound to the node's calibration scale
    (the fully_connected case — one op per node). With ``subs`` (the
    transformer blocks' sub-layer paths, e.g. 'attn/qkv'): a MAPPING
    sub -> callable, each bound to its own per-sublayer scale when the
    calibration recorded one ('<node>/<sub>' keys), falling back to the
    node's max — strictly finer clipping than one shared scale."""
    import functools
    if ctx.quantize == "int8":
        from deepcv_tpu.compression import int8_dot_general
        base = int8_dot_general
        extra = {}
    elif _qat_bits(ctx.quantize):
        from deepcv_tpu.compression import fake_quant_dot_general
        base = fake_quant_dot_general
        extra = {"bits": _qat_bits(ctx.quantize)}
    else:
        return None
    node_scale = ctx.quantize_scales.get(ctx.scope + name)
    if not subs:
        return functools.partial(base, act_scale=node_scale, **extra)
    return {sub: functools.partial(
        base,
        act_scale=ctx.quantize_scales.get(f"{ctx.scope}{name}/{sub}",
                                          node_scale),
        **extra) for sub in subs}


@submodule_creator("patch_embed",
                   allowed=("patch_size", "embed_dim", "use_cls_token",
                            "dropout_prob"),
                   required=("patch_size", "embed_dim"))
def _patch_embed(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Patchify + linear embed + [cls] + position table (ops/attention.py:
    PatchEmbed — reshape + one Dense on the MXU, not a stride-p conv)."""
    from deepcv_tpu.ops.attention import PatchEmbed
    return PatchEmbed(patch_size=int(params["patch_size"]),
                      embed_dim=int(params["embed_dim"]),
                      use_cls_token=bool(params.get("use_cls_token", True)),
                      dropout_prob=float(params.get("dropout_prob") or 0.0),
                      dot_general=_quantized_dot_general(ctx, name,
                                                         subs=("proj",)),
                      dtype=ctx.dtype, param_dtype=ctx.param_dtype, name=name)


@submodule_creator("transformer_block", aliases=("encoder_block",),
                   allowed=("num_heads", "mlp_dim", "dropout_prob",
                            "attn_dropout_prob", "drop_path_prob",
                            "attn_impl", "ln_eps", "moe", "mlp_act", "norm"),
                   required=("num_heads", "mlp_dim"))
def _transformer_block(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Pre-LN transformer encoder block (torchvision EncoderBlock wiring;
    ``attn_impl: flash`` switches to the Pallas online-softmax kernel;
    ``drop_path_prob`` = stochastic depth on both residual branches;
    ``moe: {num_experts, k, capacity_factor, router_noise}`` swaps the
    dense MLP for a V-MoE expert mixture — see ops/moe.py)."""
    from deepcv_tpu.ops.attention import TransformerEncoderBlock
    moe = params.get("moe") or None
    if moe is not None and "num_experts" not in moe:
        raise ValueError(f"{name}: moe config requires num_experts "
                         f"(got {dict(moe)})")
    return TransformerEncoderBlock(
        num_heads=int(params["num_heads"]), mlp_dim=int(params["mlp_dim"]),
        dropout_prob=float(params.get("dropout_prob") or 0.0),
        attn_dropout_prob=float(params.get("attn_dropout_prob") or 0.0),
        drop_path_prob=float(params.get("drop_path_prob") or 0.0),
        attn_impl=str(params.get("attn_impl", "xla")),
        dot_general=_quantized_dot_general(
            ctx, name, subs=("attn/qkv", "attn/out", "mlp/fc1", "mlp/fc2")),
        ln_eps=float(params.get("ln_eps", 1e-6)),
        norm=str(params.get("norm", "layer_norm")),
        moe=dict(moe) if moe else None,
        mlp_act=str(params.get("mlp_act", "gelu")),
        dtype=ctx.dtype, name=name)


@submodule_creator("swin_block",
                   allowed=("num_heads", "window", "shift", "mlp_ratio",
                            "drop_path_prob", "ln_eps", "norm"),
                   required=("num_heads",))
def _swin_block(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Swin transformer block on a spatial map (arXiv:2103.14030):
    (shifted-)window attention with relative-position bias + exact-GELU
    MLP; ``shift: window // 2`` gives the SW-MSA variant."""
    from deepcv_tpu.ops.attention import SwinBlock
    return SwinBlock(num_heads=int(params["num_heads"]),
                     window=int(params.get("window", 7)),
                     shift=int(params.get("shift", 0)),
                     mlp_ratio=float(params.get("mlp_ratio", 4.0)),
                     drop_path_prob=float(params.get("drop_path_prob") or 0.0),
                     dot_general=_quantized_dot_general(
                         ctx, name,
                         subs=("attn/qkv", "attn/out", "mlp/fc1", "mlp/fc2")),
                     ln_eps=float(params.get("ln_eps", 1e-5)),
                     norm=str(params.get("norm", "layer_norm")),
                     dtype=ctx.dtype, name=name)


@submodule_creator("patch_merging", allowed=("ln_eps",))
def _patch_merging(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Swin between-stage downsampling: 2x2 concat + LN + bias-free
    Linear to 2C."""
    from deepcv_tpu.ops.attention import PatchMerging
    return PatchMerging(ln_eps=float(params.get("ln_eps", 1e-5)),
                        dot_general=_quantized_dot_general(ctx, name,
                                                           subs=("reduce",)),
                        dtype=ctx.dtype, name=name)


@submodule_creator("take_token", allowed=("index",))
def _take_token(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """(N, T, D) -> (N, D): pick one token ([cls] by default)."""
    from deepcv_tpu.ops.attention import TakeToken
    return TakeToken(index=int(params.get("index", 0)), name=name)


@submodule_creator("norm", aliases=("normalization",),
                   allowed=dnn.NormTechnique.ALL)
def _norm_node(params, ctx: CreatorContext, name: str) -> fnn.Module:
    """Bare normalization node — e.g. the final encoder LayerNorm of a ViT
    (params are norm-technique specs, same shape as the layer-unit ones:
    ``{layer_norm: {eps: 1e-6}}``)."""
    norms = tuple(dnn.normalization_techniques(
        _norm_specs_from_params(params), dtype=ctx.dtype,
        axis_name=ctx.axis_name))
    if not norms:
        raise ValueError(f"Submodule '{name}' (norm): no normalization "
                         f"technique given; expected one of "
                         f"{list(dnn.NormTechnique.ALL)}")
    return dnn.Layer(op=dnn.Identity(name=f"{name}_op"), norms=norms,
                     name=name)


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
