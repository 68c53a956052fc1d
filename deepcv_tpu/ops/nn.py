"""NN building blocks — TPU-first (NHWC, bf16-friendly, XLA-fusable).

Reference parity: /root/reference/src/deepcv/meta/nn.py. The central unit is
:class:`Layer`, the rebuild of the reference ``layer()`` block
(nn.py:519-554): dropout -> op -> act -> norms (post-activation) or
dropout -> norms -> act -> op (pre-activation). On TPU the op is an XLA conv/
matmul hitting the MXU and everything else fuses into it; a Pallas fused
norm+act path covers the cases XLA doesn't fuse (see deepcv_tpu.ops.pallas).

Layout conventions (TPU-native, differs from the torch reference):
  * images are NHWC (torch reference is NCHW) — channel-last is the layout XLA
    tiles best on TPU (lane dim = channels);
  * "channel dim" in reference semantics (e.g. dense_link concat at dim=1,
    base_module.py:285-289) maps to axis=-1 here.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as fnn

from deepcv_tpu.utils import register, GLOBAL_REGISTRY, get_by_identifier

__all__ = [
    "ACTIVATION_FNS", "XAVIER_GAINS", "get_activation", "get_gain",
    "xavier_uniform_with_gain", "xavier_normal_with_gain", "BatchNorm",
    "Layer", "NormTechnique", "normalization_techniques",
    "ConvTransposeTorch", "Flatten", "Identity", "MultiHeadConcat", "ConcatCoords", "ConcatHilbertCoords",
    "concat_coords_maps", "concat_hilbert_coords_map", "interpolate",
    "get_padding_from_kernel", "get_model_capacity", "get_out_features_shape",
    "ensure_mean_batch_loss", "func_to_module", "avg_pool_nd", "max_pool_nd",
    "BlurCurriculum",
]

# --------------------------------------------------------------------------- #
# Activations & init gains
# --------------------------------------------------------------------------- #

#: name -> activation callable (XAVIER_INIT_SUPPORTED_ACT_FN parity, nn.py:46)
ACTIVATION_FNS: Dict[str, Callable] = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "hard_swish": jax.nn.hard_swish,
    "hard_sigmoid": jax.nn.hard_sigmoid,   # relu6(x+3)/6, torch Hardsigmoid
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    # torch nn.GELU default is the exact erf form; jax.nn.gelu defaults to
    # the tanh approximation (~1e-3 apart) — ConvNeXt/ViT parity needs exact
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "elu": jax.nn.elu,
    "softmax": jax.nn.softmax,
    "log_softmax": jax.nn.log_softmax,
    "identity": lambda x: x,
    "linear": lambda x: x,
}

#: torch.nn.init.calculate_gain parity — per-activation Xavier gain
XAVIER_GAINS: Dict[str, float] = {
    "relu": math.sqrt(2.0),
    "relu6": math.sqrt(2.0),
    "hard_swish": math.sqrt(2.0),   # relu-family (torch defines no gain)
    "leaky_relu": math.sqrt(2.0 / (1.0 + 0.01 ** 2)),
    "sigmoid": 1.0,
    "hard_sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "gelu": math.sqrt(2.0),
    "gelu_exact": math.sqrt(2.0),
    "silu": math.sqrt(2.0),
    "elu": 1.0,
    "identity": 1.0,
    "linear": 1.0,
    "softmax": 1.0,
    "log_softmax": 1.0,
}

for _n, _f in ACTIVATION_FNS.items():
    register(_n, _f)


def get_activation(act: Union[None, str, Callable]) -> Optional[Callable]:
    """Resolve an activation spec (name / callable / TaggedFactory / None)."""
    if act is None:
        return None
    resolve = getattr(act, "resolve", None)
    if resolve is not None:  # TaggedFactory from YAML
        return resolve()
    if callable(act) and not isinstance(act, str):
        return act
    return get_by_identifier(str(act))


def get_gain(act: Union[None, str, Callable]) -> float:
    """Xavier gain for an activation (reference ``get_gain_name``, nn.py:585-605)."""
    if act is None:
        return 1.0
    name = act if isinstance(act, str) else getattr(act, "identifier", None) or getattr(act, "__name__", "")
    name = str(name).rsplit(".", 1)[-1].lower()
    # normalize lambda wrappers registered under canonical names
    for known, fn in ACTIVATION_FNS.items():
        if act is fn:
            name = known
            break
    return XAVIER_GAINS.get(name, 1.0)


def _xavier_fans(shape) -> Tuple[int, int]:
    if len(shape) >= 2:
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        return shape[-2] * receptive, shape[-1] * receptive
    return shape[0], shape[0]


def xavier_uniform_with_gain(gain: float = 1.0):
    """Xavier/Glorot uniform initializer scaled by ``gain``.

    Reference ``DeepcvModule._initialize_parameters`` applies
    ``torch.nn.init.xavier_uniform_(w, gain=calculate_gain(act))`` to
    fully-connected weights (base_module.py:251-253).
    limit = gain * sqrt(6 / (fan_in + fan_out)).
    """
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _xavier_fans(shape)
        limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)

    return init


def xavier_normal_with_gain(gain: float = 1.0):
    """Xavier/Glorot NORMAL initializer scaled by ``gain`` — the reference
    initializes CONV weights with ``torch.nn.init.xavier_normal_``
    (base_module.py:247-249; fully-connected get xavier_uniform_).
    std = gain * sqrt(2 / (fan_in + fan_out))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _xavier_fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


# --------------------------------------------------------------------------- #
# Shape / padding helpers
# --------------------------------------------------------------------------- #

def get_padding_from_kernel(kernel_size: Sequence[int]) -> Tuple[int, ...]:
    """'same'-padding from odd kernel sizes (reference nn.py:393-399)."""
    if any(k % 2 == 0 for k in kernel_size):
        raise ValueError(f"Cannot infer 'same' padding for even kernel {kernel_size}")
    return tuple(k // 2 for k in kernel_size)


def avg_pool_nd(x: jnp.ndarray, kernel_size, stride=None, padding=0) -> jnp.ndarray:
    """N-d average pooling on channel-last tensors (reference avg_pooling_nd)."""
    k = tuple(kernel_size) if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * (x.ndim - 2)
    s = tuple(stride) if isinstance(stride, (tuple, list)) else ((stride,) * len(k) if stride else k)
    if isinstance(padding, int):
        padding = ((padding, padding),) * len(k)
    elif padding and isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    return fnn.avg_pool(x, window_shape=k, strides=s, padding=padding or "VALID")


def max_pool_nd(x: jnp.ndarray, kernel_size, stride=None, padding=0) -> jnp.ndarray:
    k = tuple(kernel_size) if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * (x.ndim - 2)
    s = tuple(stride) if isinstance(stride, (tuple, list)) else ((stride,) * len(k) if stride else k)
    if isinstance(padding, int):
        padding = ((padding, padding),) * len(k)
    elif padding and isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    return fnn.max_pool(x, window_shape=k, strides=s, padding=padding or "VALID")


def interpolate(x: jnp.ndarray, target_shape: Sequence[int],
                method: str = "linear", align_corners: bool = False) -> jnp.ndarray:
    """Resize spatial dims of a channel-last tensor to ``target_shape``.

    Reference ``deepcv.meta.nn.interpolate`` (nn.py:665-676) auto-selected
    linear/bilinear/trilinear by rank; jax.image.resize('linear') covers all
    ranks. ``target_shape`` is the spatial shape only (no batch/channels).
    """
    target_shape = tuple(int(t) for t in target_shape)
    if x.shape[1:-1] == target_shape:
        return x
    full = (x.shape[0], *target_shape, x.shape[-1])
    # antialias=False: torch F.interpolate does NOT low-pass filter when
    # downscaling (jax.image.resize defaults to antialias=True, which is a
    # different operator — caught by the torch parity oracle)
    return jax.image.resize(x, full, method=method, antialias=False)


def get_model_capacity(params) -> int:
    """Total trainable scalar count of a param pytree
    (reference ``get_model_capacity``, nn.py:679-686)."""
    if params is None:
        return 0
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))


def get_out_features_shape(module, input_shape: Sequence[int], rng=None,
                           has_batch_dim: bool = True) -> Tuple[int, ...]:
    """Output shape of a flax module for a given input shape — via
    ``jax.eval_shape`` (NO real forward; replaces the reference's dummy-tensor
    forwards, nn.py:689-704)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    shape = tuple(input_shape) if has_batch_dim else (1, *input_shape)
    x = jax.ShapeDtypeStruct(shape, jnp.float32)

    def init_apply(x):
        variables = module.init(rng, x)
        return module.apply(variables, x)

    out = jax.eval_shape(init_apply, x)
    return tuple(out.shape)


def ensure_mean_batch_loss(loss_values: jnp.ndarray) -> jnp.ndarray:
    """Reduce any per-example / per-element loss tensor to a scalar mean
    (reference ``ensure_mean_batch_loss``, nn.py:640-662)."""
    return jnp.mean(loss_values)


# --------------------------------------------------------------------------- #
# Normalization techniques
# --------------------------------------------------------------------------- #

class NormTechnique:
    """Normalization technique names (reference NormTechnique enum, nn.py:433-441)."""
    BATCH_NORM = "batch_norm"
    LAYER_NORM = "layer_norm"
    INSTANCE_NORM = "instance_norm"
    GROUP_NORM = "group_norm"
    LOCAL_RESPONSE_NORM = "local_response_norm"
    # LayerNorm with mean-only BatchNorm (reference 'layer_nrm_and_mean_batch_nrm')
    LAYER_NRM_AND_MEAN_BATCH_NRM = "layer_nrm_and_mean_batch_nrm"
    # TPU-era addition beyond the reference enum: RMSNorm (Zhang & Sennrich,
    # arXiv:1910.07467) — scale-only, no mean subtraction, so one reduction
    # pass instead of LayerNorm's two. Activation norms are pure HBM traffic
    # on TPU (design.md §5.13: 24 LNs = 49 ms/step in ViT-B training), which
    # makes the cheaper formula a throughput lever, not just a param saving.
    RMS_NORM = "rms_norm"

    ALL = (BATCH_NORM, LAYER_NORM, INSTANCE_NORM, GROUP_NORM,
           LOCAL_RESPONSE_NORM, LAYER_NRM_AND_MEAN_BATCH_NRM, RMS_NORM)


def make_token_norm(norm: str, eps: float, dtype, name: str) -> fnn.Module:
    """The transformer/modern-CNN families' last-axis norm: 'layer_norm'
    (parity default) or 'rms_norm' (scale-only, single reduction — the
    cheaper TPU form, design.md §5.13). Shared by the ViT/Swin blocks and
    ConvNeXt so the lever is spelled the same everywhere."""
    if norm == "layer_norm":
        return fnn.LayerNorm(epsilon=float(eps), dtype=dtype, name=name)
    if norm == "rms_norm":
        return fnn.RMSNorm(epsilon=float(eps), dtype=dtype, name=name)
    raise ValueError(f"norm must be 'layer_norm' or 'rms_norm', "
                     f"got {norm!r}")


class LocalResponseNorm(fnn.Module):
    """AlexNet-style local response normalization across channels (last axis).

    torch parity: ``torch.nn.LocalResponseNorm(size, alpha, beta, k)`` over the
    channel dim; here channels are axis -1. Pure elementwise + windowed sum —
    XLA fuses it entirely on the VPU.
    """
    size: int = 5
    alpha: float = 1e-4
    beta: float = 0.75
    k: float = 1.0

    @fnn.compact
    def __call__(self, x):
        sq = jnp.square(x)
        c = x.shape[-1]
        half = self.size // 2
        # windowed sum over channel axis via padded cumulative trick
        padded = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(half, self.size - 1 - half)])
        csum = jnp.cumsum(padded, axis=-1)
        zero = jnp.zeros_like(csum[..., :1])
        csum = jnp.concatenate([zero, csum], axis=-1)
        win = csum[..., self.size:] - csum[..., :-self.size]
        win = win[..., :c]
        denom = (self.k + (self.alpha / self.size) * win) ** self.beta
        return x / denom


def _uniform01_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype)


class BatchNorm(fnn.Module):
    """Batch normalization with TORCH semantics (verified against an
    executing ``torch.nn.BatchNorm2d`` in tests/test_torch_parity.py):

      * ``momentum`` uses the torch convention
        ``running = (1 - m) * running + m * batch_stat`` (reference YAML
        carries torch-convention values, e.g. parameters.yml:83
        ``momentum: 0.0736``) — flax's convention is the complement;
      * normalization uses the BIASED batch variance, but the running-var
        update uses the UNBIASED (Bessel-corrected) variance, exactly like
        ``torch.nn.BatchNormNd`` — flax updates with the biased one, which
        skews eval-mode outputs for small batches;
      * ``scale`` initializes from uniform[0,1): the reference's
        ``_initialize_parameters`` explicitly re-inits BN gamma with
        ``torch.nn.init.uniform_`` (base_module.py:254-257), overriding the
        torch default of ones.

    Stats reduce in float32. ``axis_name`` syncs batch statistics across a
    mapped axis (SyncBatchNorm under shard_map/pmap); under plain jit with a
    batch-sharded input the statistics are global by construction (GSPMD
    inserts the collectives), so ``axis_name`` stays None there.
    """
    momentum: float = 0.1             # torch convention
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None
    use_running_average: Optional[bool] = None
    scale_init: Callable = _uniform01_init

    @fnn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = fnn.merge_param("use_running_average",
                                 self.use_running_average, use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = int(np.prod([x.shape[a] for a in reduce_axes]))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
                mean2 = jax.lax.pmean(mean2, axis_name=self.axis_name)
                n = n * jax.lax.psum(1, axis_name=self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        # fold mean/var/gamma/beta into per-channel a,b (f32), then apply ONE
        # fused multiply-add in the compute dtype: no full-tensor f32
        # intermediates — the elementwise chain XLA has to schedule around
        # the convs is 1 op instead of 4
        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        if self.use_scale:
            g = self.param("scale", self.scale_init, (c,), jnp.float32)
            a, b = a * g, b * g
        if self.use_bias:
            b = b + self.param("bias", fnn.initializers.zeros, (c,), jnp.float32)
        dt = self.dtype or x.dtype
        return x.astype(dt) * a.astype(dt) + b.astype(dt)


class MeanOnlyBatchNorm(fnn.Module):
    """Mean-only batch normalization (running-mean subtraction, no variance) —
    half of the reference's 'layer_nrm_and_mean_batch_nrm' technique."""
    momentum: float = 0.1
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = fnn.merge_param("use_running_average",
                                 self.use_running_average, use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        if use_ra:
            mean = ra_mean.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
        return x - mean.astype(x.dtype)


def normalization_techniques(norm_specs: Mapping[str, Optional[Mapping[str, Any]]],
                             dtype=None, axis_name: Optional[str] = None):
    """Build the list of norm modules from spec dicts.

    Reference ``normalization_techniques(_impl)`` (nn.py:433-516): accepts any
    subset of {batch_norm, layer_norm, instance_norm, group_norm,
    local_response_norm, layer_nrm_and_mean_batch_nrm, rms_norm} with
    torch-style kwargs;
    feature counts are inferred lazily by flax (the reference inferred them via
    dummy forwards). ``axis_name`` wires cross-replica (Sync) BatchNorm stats
    through ``lax.pmean`` — the TPU-native SyncBatchNorm
    (reference ignite_training.py:382-386).
    """
    mods = []
    for tech, spec in (norm_specs or {}).items():
        if spec is None or spec is False:
            continue
        spec = dict(spec) if isinstance(spec, Mapping) else {}
        if tech == NormTechnique.BATCH_NORM:
            mods.append(BatchNorm(
                momentum=float(spec.get("momentum", 0.1)),  # torch convention
                epsilon=float(spec.get("eps", 1e-5)),
                use_bias=bool(spec.get("affine", True)),
                use_scale=bool(spec.get("affine", True)),
                axis_name=axis_name, dtype=dtype))
        elif tech == NormTechnique.LAYER_NORM:
            mods.append(fnn.LayerNorm(
                epsilon=float(spec.get("eps", 1e-5)),
                use_bias=bool(spec.get("elementwise_affine", True)),
                use_scale=bool(spec.get("elementwise_affine", True)),
                dtype=dtype))
        elif tech == NormTechnique.INSTANCE_NORM:
            # instance norm == group norm with one group per channel
            mods.append(fnn.GroupNorm(
                num_groups=None, group_size=1,
                epsilon=float(spec.get("eps", 1e-5)),
                use_bias=bool(spec.get("affine", True)),
                use_scale=bool(spec.get("affine", True)),
                dtype=dtype))
        elif tech == NormTechnique.GROUP_NORM:
            mods.append(fnn.GroupNorm(
                num_groups=int(spec.get("num_groups", 32)),
                epsilon=float(spec.get("eps", 1e-5)),
                use_bias=bool(spec.get("affine", True)),
                use_scale=bool(spec.get("affine", True)),
                dtype=dtype))
        elif tech == NormTechnique.RMS_NORM:
            mods.append(fnn.RMSNorm(
                epsilon=float(spec.get("eps", 1e-6)),
                use_scale=bool(spec.get("elementwise_affine", True)),
                dtype=dtype))
        elif tech == NormTechnique.LOCAL_RESPONSE_NORM:
            mods.append(LocalResponseNorm(
                size=int(spec.get("size", 5)),
                alpha=float(spec.get("alpha", 1e-4)),
                beta=float(spec.get("beta", 0.75)),
                k=float(spec.get("k", 1.0))))
        elif tech == NormTechnique.LAYER_NRM_AND_MEAN_BATCH_NRM:
            mods.append(MeanOnlyBatchNorm(
                momentum=float(spec.get("momentum", 0.1)), axis_name=axis_name))
            mods.append(fnn.LayerNorm(
                epsilon=float(spec.get("eps", 1e-5)),
                use_bias=bool(spec.get("elementwise_affine", True)),
                use_scale=bool(spec.get("elementwise_affine", True)),
                dtype=dtype))
        else:
            raise ValueError(f"Unknown normalization technique '{tech}'; "
                             f"expected one of {NormTechnique.ALL}")
    return mods


class ConvTransposeTorch(fnn.Module):
    """Transposed convolution with TORCH semantics (verified against an
    executing ``torch.nn.ConvTranspose2d`` in tests/test_torch_parity.py).

    The true transpose of the forward conv: input dilated by ``strides``,
    kernel spatially FLIPPED, per-side padding ``dilation*(k-1) - padding``
    plus ``output_padding`` on the trailing edge — so
    ``out = (in-1)*s - 2p + d*(k-1) + 1 + op`` exactly like torch.
    flax's ``nn.ConvTranspose`` implements a different operator (no kernel
    flip, grow-by-VALID shape rule) whose values AND shapes both diverge
    from the reference's ``torch.nn.ConvTranspose2d``
    (submodule_creators.py:265-267).

    Kernel layout: spatial..., in, out (HWIO-style) — same as fnn.Conv, so
    checkpoints and init logic are uniform across conv types.
    """
    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    padding: Any = 0
    output_padding: Any = 0
    kernel_dilation: Any = 1
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = fnn.initializers.lecun_normal()
    bias_init: Callable = fnn.initializers.zeros

    @fnn.compact
    def __call__(self, x):
        nd = len(self.kernel_size)
        strides = self.strides or (1,) * nd
        as_tup = lambda v: tuple(v) if isinstance(v, (tuple, list)) else (int(v),) * nd
        pads, ops, dil = as_tup(self.padding), as_tup(self.output_padding), \
            as_tup(self.kernel_dilation)
        # collapse ((p,p),...) pair form to per-dim ints
        pads = tuple(p[0] if isinstance(p, (tuple, list)) else int(p) for p in pads)
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*self.kernel_size, cin, self.features),
                            self.param_dtype)
        kernel = jnp.asarray(kernel, self.dtype or x.dtype)
        flip = kernel[tuple(slice(None, None, -1) for _ in range(nd))]
        pad_cfg = tuple(
            (d * (k - 1) - p, d * (k - 1) - p + op)
            for k, p, op, d in zip(self.kernel_size, pads, ops, dil))
        spatial = "DHW"[-nd:] if 1 <= nd <= 3 else None
        if spatial is None:
            raise ValueError("ConvTransposeTorch supports 1-3 spatial dims")
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x, self.dtype or x.dtype), flip,
            window_strides=(1,) * nd, padding=pad_cfg,
            lhs_dilation=tuple(strides), rhs_dilation=dil,
            dimension_numbers=dn)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
            y = y + jnp.asarray(b, y.dtype)
        return y


def pad_channels_for_tpu(x: jnp.ndarray, min_channels: int = 8) -> jnp.ndarray:
    """Zero-pad trailing (channel) dim up to ``min_channels``.

    The axon/TPU XLA backend pathologically compiles the weight-gradient of
    convolutions with small input channel counts (measured on v5e, batch 1024,
    5x5 kernel: cin=3 -> 405s, cin=4 -> 160s, cin=8 -> 3s; runtime identical).
    Zero channels are mathematically inert: they contribute nothing forward
    and receive zero gradient, so every conv input is padded to >= 8 lanes.
    """
    c = x.shape[-1]
    if c < min_channels:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, min_channels - c)]
        return jnp.pad(x, pad)
    return x


def _is_conv_op(op) -> bool:
    from deepcv_tpu.ops.pallas.fused_layer import PallasConv
    inner = getattr(op, "layer_instance", op)  # SpectralNorm/WeightNorm wrappers
    return isinstance(inner, (fnn.Conv, fnn.ConvTranspose, ConvTransposeTorch,
                              PallasConv))


def _conv_groups(op) -> int:
    inner = getattr(op, "layer_instance", op)
    return int(getattr(inner, "feature_group_count", 1) or 1)


_STATEFUL_NORMS = (fnn.BatchNorm, BatchNorm, MeanOnlyBatchNorm)


def _apply_norm(mod, x, train: bool):
    if isinstance(mod, _STATEFUL_NORMS):
        return mod(x, use_running_average=not train)
    return mod(x)


# --------------------------------------------------------------------------- #
# The fused block unit: Layer
# --------------------------------------------------------------------------- #

class Layer(fnn.Module):
    """The reference ``layer()`` unit (nn.py:519-554) as one flax module.

    Post-activation (default): dropout -> op -> act -> norms
    Pre-activation:            dropout -> norms -> act -> op

    ``op`` is any flax module (Conv/Dense/...); ``norms`` comes from
    :func:`normalization_techniques` specs. Under jit, XLA fuses the
    elementwise act/dropout/norm-affine chain into the conv/matmul epilogue —
    this single module is the unit the Pallas fused kernels specialize.
    """
    op: fnn.Module
    act_fn: Optional[Callable] = None
    dropout_prob: float = 0.0
    preactivation: bool = False
    norms: Sequence[fnn.Module] = ()
    #: the op already applies act_fn in its epilogue (fused Pallas conv)
    act_in_op: bool = False

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dropout_prob and self.dropout_prob > 0.0:
            x = fnn.Dropout(rate=float(self.dropout_prob), deterministic=not train)(x)
        def run_op(v):
            # grouped convs must NOT be channel-padded: padding changes which
            # real channels land in which group (silently wrong math when the
            # padded count still divides, a flax error when it doesn't) —
            # accept the slower cin<8 weight-grad compile for that rare case
            if _is_conv_op(self.op) and _conv_groups(self.op) == 1:
                v = pad_channels_for_tpu(v)
            # SpectralNorm-wrapped ops need power-iteration updates during training
            if isinstance(self.op, fnn.SpectralNorm):
                return self.op(v, update_stats=train)
            return self.op(v)

        if self.preactivation:
            for m in self.norms:
                x = _apply_norm(m, x, train)
            if self.act_fn is not None:
                x = self.act_fn(x)
            x = run_op(x)
        else:
            x = run_op(x)
            if self.act_fn is not None and not self.act_in_op:
                x = self.act_fn(x)
            for m in self.norms:
                x = _apply_norm(m, x, train)
        return x


# --------------------------------------------------------------------------- #
# Small modules
# --------------------------------------------------------------------------- #

class Identity(fnn.Module):
    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return x


class Interpolate(fnn.Module):
    """Spatial resize node: to an explicit ``size`` or by a ``scale``
    factor (channel-last, any spatial rank — :func:`interpolate`
    semantics, torch ``F.interpolate(antialias=False)`` parity)."""
    size: Optional[Tuple[int, ...]] = None
    scale: float = 0.0
    method: str = "linear"

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if self.size is not None:
            target = tuple(int(s) for s in self.size)
        elif self.scale:
            target = tuple(int(round(s * self.scale)) for s in x.shape[1:-1])
        else:
            raise ValueError("Interpolate needs 'size' or 'scale'")
        return interpolate(x, target, method=self.method)


class DropPath(fnn.Module):
    """Stochastic depth (Huang et al., arXiv:1603.09382): drop a residual
    BRANCH per sample with prob ``rate`` during training, rescaling
    survivors by 1/(1-rate) — one Bernoulli draw broadcast over all
    non-batch dims. The ONE implementation both ConvNeXt blocks and the
    transformer encoder use (and the spec engine's rng guard knows the
    ``drop_path_prob`` key that reaches it)."""
    rate: float = 0.0

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if not self.rate or self.rate <= 0.0:
            return x
        return fnn.Dropout(rate=float(self.rate),
                           broadcast_dims=tuple(range(1, x.ndim)),
                           deterministic=not train)(x)


class ConvNeXtStem(fnn.Module):
    """ConvNeXt patchify stem (Liu et al., arXiv:2201.03545): the 4x4/s4
    conv is EXACTLY a 4x4-patch reshape + one Dense — implemented that way
    (pure MXU matmul, no 3->8 conv lane padding, identical parameters) —
    followed by channels-last LayerNorm (eps 1e-6)."""
    dim: int
    patch: int = 4
    ln_eps: float = 1e-6
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        n, hgt, wid, c = x.shape
        p = int(self.patch)
        if hgt % p or wid % p:
            raise ValueError(f"input {hgt}x{wid} not divisible by patch {p}")
        gh, gw = hgt // p, wid // p
        x = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(n, gh, gw, p * p * c)
        x = fnn.Dense(int(self.dim), dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="proj")(x)
        return fnn.LayerNorm(epsilon=float(self.ln_eps), dtype=self.dtype,
                             name="ln")(x)


class ConvNeXtDownsample(fnn.Module):
    """ConvNeXt between-stage downsampling: LayerNorm then 2x2/s2 conv."""
    dim: int
    ln_eps: float = 1e-6
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        x = fnn.LayerNorm(epsilon=float(self.ln_eps), dtype=self.dtype,
                          name="ln")(x)
        return fnn.Conv(int(self.dim), (2, 2), strides=(2, 2),
                        padding="VALID", dtype=self.dtype,
                        kernel_init=xavier_uniform_with_gain(1.0),
                        name="conv")(x)


class ConvNeXtBlock(fnn.Module):
    """ConvNeXt block: depthwise 7x7 conv -> LN -> Dense(4C) -> exact GELU
    -> Dense(C) -> per-channel layer scale (init 1e-6) -> stochastic depth
    -> residual add. Channels-last throughout, so torch's NCHW<->NHWC
    permutes vanish; the pointwise 'convs' are Denses on the MXU."""
    drop_path_prob: float = 0.0
    layer_scale_init: float = 1e-6
    ln_eps: float = 1e-6
    norm: str = "layer_norm"      # or 'rms_norm' (same 'ln' param path)
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        y = fnn.Conv(c, (7, 7), padding=3, feature_group_count=c,
                     dtype=self.dtype,
                     kernel_init=xavier_uniform_with_gain(1.0),
                     name="dwconv")(x)
        y = make_token_norm(self.norm, self.ln_eps, self.dtype, "ln")(y)
        y = fnn.Dense(4 * c, dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = fnn.Dense(c, dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="fc2")(y)
        gamma = self.param("layer_scale",
                           fnn.initializers.constant(
                               float(self.layer_scale_init)), (c,),
                           jnp.float32)
        y = y * gamma.astype(y.dtype)
        return x + DropPath(rate=float(self.drop_path_prob))(y, train=train)


class FeaturePyramid(fnn.Module):
    """Feature Pyramid Network (Lin et al., arXiv:1612.03144).

    Input: a LIST of feature maps ordered fine -> coarse (C3, C4, C5...).
    Lateral 1x1 convs bring every level to ``channels``; the top-down
    pathway nearest-upsamples the coarser level and adds; a 3x3 conv
    smooths each merged map. Output: the list of P-levels (same order).

    With ``head_outputs > 0`` a SHARED 3x3 head conv (RetinaNet-style
    weight sharing across levels) is applied to every P-level and the
    results are flattened per level and concatenated to one
    (N, sum_l S_l*H_l, head_outputs) tensor — the flat dense-prediction
    layout the FPN detection pipeline trains against. All shapes static;
    everything is conv + resize, so XLA fuses the adds into the conv
    epilogues."""
    channels: int = 64
    head_outputs: int = 0
    dtype: Any = None

    @fnn.compact
    def __call__(self, xs, *, train: bool = False):
        if not isinstance(xs, (list, tuple)) or len(xs) < 2:
            raise ValueError("FeaturePyramid expects a list of >=2 feature "
                             "maps (fine -> coarse); wire it after a "
                             "_new_branch_from_tensor gather of named nodes")
        c = int(self.channels)
        lat = [fnn.Conv(c, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
               for i, x in enumerate(xs)]
        merged = [None] * len(lat)
        merged[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            up = interpolate(merged[i + 1], lat[i].shape[1:-1],
                             method="nearest")
            merged[i] = lat[i] + up
        outs = [fnn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                         name=f"smooth{i}")(m) for i, m in enumerate(merged)]
        if self.head_outputs:
            head = fnn.Conv(int(self.head_outputs), (3, 3), padding=1,
                            dtype=self.dtype, name="shared_head")
            flat = [head(o).reshape(o.shape[0], -1, int(self.head_outputs))
                    for o in outs]
            return jnp.concatenate(flat, axis=1)
        return outs


class Flatten(fnn.Module):
    """Flatten all non-batch dims (torch.nn.Flatten parity)."""
    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return x.reshape((x.shape[0], -1))


class FlattenThen(fnn.Module):
    """Flatten non-batch dims, then apply ``inner`` (the fully_connected
    creator's ``flatten_input: true``)."""
    inner: fnn.Module

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return self.inner(x.reshape((x.shape[0], -1)))


class MultiHeadConcat(fnn.Module):
    """Apply N head modules to the same input and concat along ``axis``
    (reference ``multi_head_forward``/``MultiHeadConcat``, nn.py:300-316)."""
    heads: Sequence[fnn.Module]
    axis: int = -1

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        outs = [h(x) for h in self.heads]
        return jnp.concatenate(outs, axis=self.axis)


def func_to_module(fn: Callable, name: Optional[str] = None):
    """Wrap a pure function into a flax module class
    (reference ``func_to_module``, nn.py:197-264 — signature surgery replaced
    by closure capture; kwargs become module attributes via functools.partial).
    """
    class _FnModule(fnn.Module):
        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return fn(x)

    _FnModule.__name__ = name or getattr(fn, "__name__", "FnModule")
    return _FnModule


# --------------------------------------------------------------------------- #
# CoordConv (euclidean + Hilbert) — reference nn.py:319-390
# --------------------------------------------------------------------------- #

def concat_coords_maps(x: jnp.ndarray, channel_dim: int = -1) -> jnp.ndarray:
    """Append normalized [-1, 1] coordinate maps, one per spatial dim
    (CoordConv, arXiv:1807.03247; reference ``concat_coords_maps``)."""
    spatial = x.shape[1:-1]
    coords = []
    for d, size in enumerate(spatial):
        ramp = jnp.linspace(-1.0, 1.0, size, dtype=x.dtype) if size > 1 else jnp.zeros((1,), x.dtype)
        shape = [1] * x.ndim
        shape[1 + d] = size
        ramp = ramp.reshape(shape)
        ramp = jnp.broadcast_to(ramp, (x.shape[0], *spatial, 1))
        coords.append(ramp)
    return jnp.concatenate([x, *coords], axis=-1)


def _hilbert_d2xy_map(order: int) -> np.ndarray:
    """(2^order, 2^order) map of normalized Hilbert-curve distance per pixel.

    Host-side (numpy) construction, embedded as a constant in the jitted graph.
    Replaces the reference's `hilbertcurve` package dependency.
    """
    n = 1 << order
    dist = np.zeros((n, n), dtype=np.int64)
    for y in range(n):
        for x in range(n):
            rx = ry = 0
            d = 0
            xx, yy = x, y
            s = n // 2
            while s > 0:
                rx = 1 if (xx & s) > 0 else 0
                ry = 1 if (yy & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                # rotate
                if ry == 0:
                    if rx == 1:
                        xx = s - 1 - xx
                        yy = s - 1 - yy
                    xx, yy = yy, xx
                s //= 2
            dist[y, x] = d
    return dist.astype(np.float32) / float(n * n - 1)


_HILBERT_CACHE: Dict[int, np.ndarray] = {}


def concat_hilbert_coords_map(x: jnp.ndarray) -> jnp.ndarray:
    """Append ONE channel holding normalized Hilbert-curve distance
    (reference ``concat_hilbert_coords_map``, nn.py:319-390). Requires 2D
    spatial dims; the map is computed for the smallest 2^k grid covering the
    image then cropped."""
    if x.ndim != 4:
        raise ValueError(f"Hilbert coords require NHWC images, got shape {x.shape}")
    h, w = x.shape[1], x.shape[2]
    order = max(1, int(math.ceil(math.log2(max(h, w)))))
    if order not in _HILBERT_CACHE:
        _HILBERT_CACHE[order] = _hilbert_d2xy_map(order)
    m = jnp.asarray(_HILBERT_CACHE[order][:h, :w], dtype=x.dtype)
    m = jnp.broadcast_to(m[None, :, :, None], (x.shape[0], h, w, 1))
    return jnp.concatenate([x, m], axis=-1)


class ConcatCoords(fnn.Module):
    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return concat_coords_maps(x)


class ConcatHilbertCoords(fnn.Module):
    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return concat_hilbert_coords_map(x)


register("flatten", Flatten)
register("identity_module", Identity)
register("concat_coords_module", ConcatCoords)
register("concat_hilbert_coords_module", ConcatHilbertCoords)


# --------------------------------------------------------------------------- #
# Module introspection + forward-convention helpers (reference nn.py:130-194,
# 707-726)
# --------------------------------------------------------------------------- #

def is_conv(module) -> bool:
    """True for conv-typed modules/ops (reference ``is_conv``, nn.py:707-726)."""
    from deepcv_tpu.ops.pallas.fused_layer import PallasConv
    inner = getattr(module, "layer_instance", module)  # SN/WN wrappers
    inner = getattr(inner, "op", inner)                # Layer wrapper
    inner = getattr(inner, "layer_instance", inner)
    return isinstance(inner, (fnn.Conv, fnn.ConvTranspose, PallasConv))


def is_fully_connected(module) -> bool:
    inner = getattr(module, "layer_instance", module)
    inner = getattr(inner, "op", inner)
    inner = getattr(inner, "layer_instance", inner)
    return isinstance(inner, fnn.Dense)


def contains_conv(module) -> bool:
    """True when any (recursively reachable) child is a conv
    (reference ``contains_conv``; linen exposes children as dataclass attrs)."""
    if is_conv(module):
        return True
    seen = set()

    def walk(obj, depth=0):
        if id(obj) in seen or depth > 8:
            return False
        seen.add(id(obj))
        if isinstance(obj, fnn.Module):
            if is_conv(obj):
                return True
            fields = [getattr(obj, f.name, None)
                      for f in obj.__dataclass_fields__.values()]
        elif isinstance(obj, Mapping):
            fields = list(obj.values())
        elif isinstance(obj, (list, tuple)):
            fields = list(obj)
        else:
            return False
        return any(walk(f, depth + 1) for f in fields)

    return walk(module)


def tensor_sequence_adapter(fn: Callable) -> Callable:
    """Standardize forward conventions: a single-tensor function becomes
    sequence-aware — applied in parallel over a list input, with output
    flattening (reference ``forward_call_convention_dec``, nn.py:130-194 —
    its tensor-ref plumbing lives in spec.creators.ForwardCallback)."""
    import functools

    @functools.wraps(fn)
    def wrapped(x, *args, **kwargs):
        if isinstance(x, (list, tuple)):
            outs = [fn(xi, *args, **kwargs) for xi in x]
            return outs[0] if len(outs) == 1 else list(outs)
        return fn(x, *args, **kwargs)

    return wrapped


def multi_head_forward(x, heads: Sequence[Callable], axis: int = -1,
                       stack: bool = False):
    """Apply N head callables to one input, concat/stack outputs
    (reference ``multi_head_forward``, nn.py:300-316)."""
    outs = [h(x) for h in heads]
    return jnp.stack(outs, axis=axis) if stack else jnp.concatenate(outs, axis=axis)


class SqueezeExcitation(fnn.Module):
    """Squeeze-and-Excitation cell (arXiv:1709.01507) — working implementation
    of the reference's ``squeeze_cell`` stub (nn.py:557-582). ``act_fn`` is
    the internal activation (relu in the SE paper; silu in EfficientNet).
    ``hidden_channels`` overrides the ratio-derived squeeze width
    (MobileNetV3 rounds it to a multiple of 8); ``gate_fn`` overrides the
    sigmoid gate (MobileNetV3 uses hard_sigmoid)."""
    reduction_ratio: int = 4
    act_fn: Any = None
    hidden_channels: int = 0          # 0 -> c // reduction_ratio
    gate_fn: Any = None               # None -> sigmoid
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        act = self.act_fn or jax.nn.relu
        gate = self.gate_fn or jax.nn.sigmoid
        squeezed = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (N, C)
        hidden = int(self.hidden_channels) or max(
            1, c // int(self.reduction_ratio))
        z = act(fnn.Dense(hidden, dtype=self.dtype, name="reduce")(squeezed))
        scale = gate(fnn.Dense(c, dtype=self.dtype, name="expand")(z))
        return x * scale.reshape(scale.shape[0], *([1] * (x.ndim - 2)), c)


class SMGModule(fnn.Module):
    """Squeeze-Multiplicative-Gating module — the building block of Hybrid
    Connectivity Gated Net (HCGN, arXiv:1908.09699), which the reference
    sketches but never implements (commented-out class + NotImplementedError
    creator, /root/reference/src/deepcv/meta/nn.py:93-125: "ops = [cell1
    squeeze_cell, cell2 multiscale_exitation_cell, gating]").

    Hybrid connectivity, per the paper: DENSE (concat) connectivity inside
    the module — each 3x3 conv sees the concat of the module input and all
    previous layer outputs — then a 1x1 transition fuses the concatenation,
    a squeeze-excitation gate scales the fused channels, and a RESIDUAL
    connection (gated sum) links the module boundary. Dense links capture
    multi-scale feature reuse; the gated residual eases optimization —
    exactly the hybrid the paper argues for.
    """
    out_channels: int
    growth_rate: int = 16
    layers: int = 3
    reduction_ratio: int = 4
    act_fn: Any = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        act = self.act_fn or jax.nn.relu
        feats = [x]
        for i in range(int(self.layers)):
            h = jnp.concatenate(feats, axis=-1)
            h = fnn.Conv(int(self.growth_rate), (3, 3), padding=1,
                         dtype=self.dtype, name=f"dense_conv{i}")(
                             pad_channels_for_tpu(h))
            feats.append(act(h))
        fused = fnn.Conv(int(self.out_channels), (1, 1), dtype=self.dtype,
                         name="transition")(jnp.concatenate(feats, axis=-1))
        gated = SqueezeExcitation(reduction_ratio=int(self.reduction_ratio),
                                  act_fn=act, dtype=self.dtype,
                                  name="gate")(fused, train=train)
        if x.shape[-1] != int(self.out_channels):
            x = fnn.Conv(int(self.out_channels), (1, 1), dtype=self.dtype,
                         name="proj")(pad_channels_for_tpu(x))
        return act(x + gated)


class EfficientChannelAttention(fnn.Module):
    """ECA channel-attention gate (arXiv:1910.03151) — an explicit TODO in
    the reference README ("channel attention gate ... sigmoid of 1D
    convolution output ... kernel size k << C with k = Func(C)",
    /root/reference/README.md:154). Global-average-pooled channel
    descriptors pass through ONE 1-D conv (k adaptively odd-sized from C,
    the paper's psi(C) with gamma=2, b=1) whose sigmoid gates each channel
    — SE's expressivity at ~k params instead of 2C^2/r.
    ``kernel_size=0`` selects the adaptive size."""
    kernel_size: int = 0
    gamma: float = 2.0
    beta: float = 1.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        k = int(self.kernel_size)
        if k == 0:
            k = int(abs((math.log2(c) + self.beta) / self.gamma))
            k = max(3, k if k % 2 else k + 1)      # nearest odd, >= 3
        if k % 2 == 0:
            raise ValueError(f"eca kernel_size must be odd, got {k}")
        squeezed = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (N, C)
        # 1-D conv ACROSS the channel axis: (N, C) as length-C 1-feature seq
        z = fnn.Conv(1, (k,), padding=((k // 2, k // 2),), use_bias=False,
                     dtype=self.dtype, name="conv")(squeezed[..., None])
        scale = jax.nn.sigmoid(z[..., 0])
        return x * scale.reshape(scale.shape[0], *([1] * (x.ndim - 2)), c)


class BlurCurriculum(fnn.Module):
    """Gaussian-blur curriculum on activations — an explicit reference TODO
    ("gaussian blur kernels applied to convolutions activations with
    decreasing blur kernel size during training steps",
    /root/reference/README.md:128). Insert after any conv in the YAML spec;
    early in training the feature maps are low-passed (coarse-to-fine
    learning / anti-aliased gradients), and the blur anneals away on a
    schedule so the converged model is untouched.

    TPU-first mechanics: the kernel SIZE stays static (XLA needs static
    shapes) and the bandwidth decays through sigma instead — a sigma-0
    Gaussian inside a fixed k-tap window IS the identity tap, so annealing
    sigma subsumes the reference's "decreasing kernel size". The blur is a
    pair (one per spatial axis) of separable depthwise 1-D convs whose taps
    are computed in-graph from the annealed sigma. Progress is counted by a
    ``batch_stats`` scalar the module owns (checkpointed / donated /
    resumable exactly like BN running stats; counts train-mode forward
    calls, so grad-accumulation micro-steps each advance it). Once the
    schedule has fully decayed (and in eval after a finished run) the taps
    are an EXACT one-hot — the module is a mathematical no-op.
    """
    kernel_size: int = 5
    init_sigma: float = 2.0
    min_sigma: float = 0.0
    decay_steps: int = 1000
    schedule: str = "cosine"          # cosine | linear | exponential
    dtype: Any = None

    def _sigma(self, count):
        t = jnp.clip(count.astype(jnp.float32) / max(1, int(self.decay_steps)),
                     0.0, 1.0)
        if self.schedule == "linear":
            f = 1.0 - t
        elif self.schedule == "cosine":
            f = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        elif self.schedule == "exponential":
            f = jnp.exp(-4.0 * t)     # ~2% of the range left at decay_steps
        else:
            raise ValueError(f"blur_curriculum schedule must be "
                             f"cosine|linear|exponential, got {self.schedule!r}")
        return self.min_sigma + (self.init_sigma - self.min_sigma) * f

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        k = int(self.kernel_size)
        if k % 2 == 0 or k < 3:
            raise ValueError(f"blur_curriculum kernel_size must be odd >= 3, "
                             f"got {k}")
        count = self.variable("batch_stats", "blur_step",
                              lambda: jnp.zeros((), jnp.int32))
        sigma = self._sigma(count.value)
        if train and not self.is_initializing():
            count.value = count.value + 1
        d = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
        w = jnp.exp(-(d * d) / (2.0 * sigma * sigma + 1e-12))
        w = w / jnp.sum(w)
        # exact identity once effectively decayed (and bf16-safe: a one-hot
        # tap loses nothing to rounding, a near-one-hot would)
        w = jnp.where(sigma > 1e-3, w, (d == 0).astype(jnp.float32))
        c = x.shape[-1]
        spatial = x.ndim - 2
        y = x
        for ax in range(spatial):                 # separable: one 1-D pass/axis
            kshape = [1] * spatial + [1, c]
            kshape[ax] = k
            wk = w.reshape([k if i == ax else 1 for i in range(spatial)] + [1, 1])
            kern = jnp.broadcast_to(wk, kshape).astype(x.dtype)
            lhs_spec, rhs_spec = {1: ("NWC", "WIO"), 2: ("NHWC", "HWIO"),
                                  3: ("NDHWC", "DHWIO")}[spatial]
            dn = jax.lax.conv_dimension_numbers(
                y.shape, tuple(kshape), (lhs_spec, rhs_spec, lhs_spec))
            y = jax.lax.conv_general_dilated(
                y, kern, (1,) * spatial, "SAME", dimension_numbers=dn,
                feature_group_count=c)
        return y


class ResNetBlock(fnn.Module):
    """Standard 2-conv residual block with optional projection shortcut —
    working implementation of the reference's ``resnet_net_block`` stub
    (nn.py:557-582). GroupNorm by default (batch-size independent)."""
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    act_fn: Any = jax.nn.relu
    num_groups: int = 8
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        k = tuple(self.kernel_size)
        pad = tuple((v // 2, v // 2) for v in k)
        groups = max(1, min(self.num_groups, self.out_channels))
        while self.out_channels % groups:
            groups -= 1
        y = fnn.Conv(self.out_channels, k, strides=(self.stride,) * 2,
                     padding=pad, dtype=self.dtype, name="conv1")(
                         pad_channels_for_tpu(x))
        y = fnn.GroupNorm(num_groups=groups, name="gn1")(y)
        y = self.act_fn(y)
        y = fnn.Conv(self.out_channels, k, padding=pad, dtype=self.dtype,
                     name="conv2")(y)
        y = fnn.GroupNorm(num_groups=groups, name="gn2")(y)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = fnn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                         dtype=self.dtype, name="proj")(pad_channels_for_tpu(x))
        return self.act_fn(y + x)


class ConvWithMetaLayer(fnn.Module):
    """Conv modulated by a learned meta-layer (FiLM, arXiv:1709.07871) —
    working interpretation of the reference's ``ConvWithMetaLayer`` /
    ``meta_layer`` stubs (nn.py:51-67, 557-582): a small meta-network maps a
    conditioning vector (default: the input's global-average-pooled features)
    to per-channel scale and shift applied to the conv output."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    meta_hidden: int = 32
    act_fn: Any = jax.nn.relu
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, conditioning=None, *, train: bool = False):
        k = tuple(self.kernel_size)
        pad = tuple((v // 2, v // 2) for v in k)
        y = fnn.Conv(self.features, k, padding=pad, dtype=self.dtype,
                     name="conv")(pad_channels_for_tpu(x))
        if conditioning is None:
            conditioning = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        h = jax.nn.relu(fnn.Dense(self.meta_hidden, dtype=self.dtype,
                                  name="meta_fc1")(conditioning))
        gamma = fnn.Dense(self.features, dtype=self.dtype, name="meta_gamma")(h)
        beta = fnn.Dense(self.features, dtype=self.dtype, name="meta_beta")(h)
        bshape = (y.shape[0],) + (1,) * (y.ndim - 2) + (self.features,)
        y = y * (1.0 + gamma.reshape(bshape)) + beta.reshape(bshape)
        return self.act_fn(y) if self.act_fn is not None else y


register("conv_with_meta_layer_module", ConvWithMetaLayer)

register("squeeze_excitation_module", SqueezeExcitation)
register("resnet_block_module", ResNetBlock)


# --------------------------------------------------------------------------- #
# Multiscale model transforms (reference stubs nn.py:267-297, implemented)
# --------------------------------------------------------------------------- #

def to_multiscale_inputs_model(model, scales: int = 3, reduction: str = "concat"):
    """Wrap a model's apply: run it on an input pyramid (1x, 1/2x, 1/4x, ...)
    and combine the outputs (reference ``to_multiscale_inputs_model`` intent,
    nn.py:267-281 — a NotImplementedError stub there).

    Returns ``apply(variables, x, **kw)``; outputs are resized to the full-
    scale output's spatial dims before 'concat'/'sum'/'mean' reduction
    ('none' returns the list).
    """
    from deepcv_tpu.spec.creators import get_reduction_fn

    reduce_fn = get_reduction_fn(reduction, default="concat")

    def apply(variables, x, **kwargs):
        outs = []
        for k in range(scales):
            xi = x if k == 0 else interpolate(
                x, tuple(max(1, s // (2 ** k)) for s in x.shape[1:-1]))
            outs.append(model.apply(variables, xi, **kwargs))
        if reduction == "none":
            return outs
        ref_hw = outs[0].shape[1:-1] if outs[0].ndim >= 3 else None
        if ref_hw:
            outs = [o if o.shape[1:-1] == ref_hw else interpolate(o, ref_hw)
                    for o in outs]
        return reduce_fn(outs)

    return apply


def to_multiscale_outputs_model(model, scales: int = 3):
    """Wrap a model's apply: return its output at multiple scales
    (full, 1/2, 1/4, ...) — reference ``to_multiscale_outputs_model`` intent
    (nn.py:283-297, stub there). Output: list highest->lowest resolution."""
    def apply(variables, x, **kwargs):
        y = model.apply(variables, x, **kwargs)
        if y.ndim < 4:
            raise ValueError("multiscale outputs need spatial feature maps")
        return [y] + [interpolate(y, tuple(max(1, s // (2 ** k))
                                           for s in y.shape[1:-1]))
                      for k in range(1, scales)]

    return apply


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
