"""HRNet building blocks — multi-resolution parallel streams (NHWC lists).

Reference parity: /root/reference/src/deepcv/meta/hrnet.py (HRNet,
arXiv:1908.07919; PyConv, arXiv:2006.11538):
  * ``ParallelConvolution`` (:30-117) — N independent convs over N parallel
    streams with per-stream kernel/groups/channels;
  * ``MultiresolutionFusion`` (:120-250) — every stream rescaled to every
    other resolution and summed; optional new lower-resolution branch;
    optional scaling-conv weight sharing;
  * representation heads V1/V2/V2p (:253-322) and ``hrnet_input_stem``
    (:325-347).

A "stream set" here is a plain list of NHWC tensors ordered highest->lowest
resolution. XLA parallelizes the independent stream convs within one program
(SURVEY §2.9: the reference's only intra-model parallelism, free on TPU).

Note: the reference module stored its convs in plain python lists/dicts, so
their params were invisible to ``model.parameters()`` (SURVEY §8) — flax's
functional params make that bug impossible here.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as fnn

from deepcv_tpu.ops import nn as dnn

__all__ = ["ParallelConvolution", "PyramidalConvolution",
           "MultiresolutionFusion", "HRNetInputStem",
           "HRNetV1RepresentationHead", "HRNetV2RepresentationHead",
           "HRNetV2pRepresentationHead"]


def _as_streams(x) -> List[jnp.ndarray]:
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _per_stream(value, n: int, name: str) -> List[Any]:
    """Broadcast a scalar spec to n streams, or validate a per-stream list."""
    if isinstance(value, (list, tuple)) and value and isinstance(value[0], (list, tuple)):
        vals = list(value)  # sequence of kernel-size pairs
    elif isinstance(value, (list, tuple)) and not isinstance(value[0], (list, tuple)):
        # ambiguous: could be one kernel pair [3,3] or per-stream scalars
        vals = list(value)
    else:
        vals = [value] * n
    if len(vals) < n:
        vals = vals + [vals[-1]] * (n - len(vals))
    return vals[:n]


class ParallelConvolution(fnn.Module):
    """Independent conv per stream (reference hrnet.py:30-117).

    ``kernel_size`` MUST be a sequence of kernel-size pairs (one per stream,
    broadcast if fewer) — the reference enforces sequence form to avoid
    scalar/pair ambiguity (hrnet.py:62-75); same rule here.
    """
    kernel_size: Any
    out_channels: Any
    groups: Any = 1
    act_fn: Optional[Callable] = None
    dropout_prob: float = 0.0
    preactivation: bool = False
    norm_specs: Optional[Mapping[str, Any]] = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        streams = _as_streams(x)
        n = len(streams)
        ks = self.kernel_size
        if not (isinstance(ks, (list, tuple)) and ks
                and isinstance(ks[0], (list, tuple))):
            raise ValueError(
                "parallel_conv 'kernel_size' must be a sequence of kernel-size "
                f"pairs, e.g. [[3, 3], [5, 5]] — got {ks!r} "
                "(reference hrnet.py sequence-form rule)")
        kss = _per_stream(ks, n, "kernel_size")
        chs = _per_stream(self.out_channels, n, "out_channels")
        grs = _per_stream(self.groups, n, "groups")
        outs = []
        for i, s in enumerate(streams):
            k = tuple(int(v) for v in kss[i])
            # snap groups to the nearest divisor of in/out channels (the
            # reference YAML requests e.g. groups=6 on 32 channels, which no
            # grouped conv can satisfy — parameters.yml:60 defect)
            g = int(grs[i])
            in_ch = s.shape[-1]
            while g > 1 and (in_ch % g or int(chs[i]) % g):
                g -= 1
            op = fnn.Conv(int(chs[i]), k, padding=tuple((v // 2, v // 2) for v in k),
                          feature_group_count=g, dtype=self.dtype,
                          kernel_init=dnn.xavier_normal_with_gain(
                              dnn.get_gain(self.act_fn)),
                          name=f"stream{i}_conv")
            layer = dnn.Layer(op=op, act_fn=self.act_fn,
                              dropout_prob=self.dropout_prob,
                              preactivation=self.preactivation,
                              norms=tuple(dnn.normalization_techniques(
                                  self.norm_specs or {}, dtype=self.dtype)),
                              name=f"stream{i}_layer")
            outs.append(layer(s, train=train))
        return outs


class PyramidalConvolution(fnn.Module):
    """PyConv (arXiv:2006.11538) — the reference's own spec for it is
    README.md:147: one conv layer with SEVERAL kernel sizes over the SAME
    input, where larger kernels use more convolution groups so every pyramid
    level costs about the same FLOPs as the smallest one; level outputs are
    concatenated on the channel axis (constant spatial size via same-padding,
    the paper's varying zero-pad note).

    ``groups=None`` (default) derives the paper's scheme: level i gets
    ``round_pow2((K_i / K_0)^2)`` groups (PyConv4 with K=(3,5,7,9) ->
    G=(1,4,8,16), the paper's table 1), snapped down to a common divisor of
    the level's in/out channels. ``out_channels`` may be the TOTAL (split
    equally, remainder to the first levels) or a per-level list.

    One norm/act/dropout ``Layer`` wraps the concatenated map — matching
    PyConvResNet, where BN+ReLU follow the whole PyConv unit, and keeping a
    single fused XLA elementwise tail instead of n per-level ones.
    """
    kernel_sizes: Any                      # e.g. (3, 5, 7, 9) or ((3,3),(5,5))
    out_channels: Any                      # int total or per-level sequence
    groups: Any = None                     # None = paper auto scheme
    act_fn: Optional[Callable] = None
    dropout_prob: float = 0.0
    preactivation: bool = False
    norm_specs: Optional[Mapping[str, Any]] = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if isinstance(x, (list, tuple)):
            raise ValueError("pyconv takes ONE feature map (use parallel_conv "
                             f"for multi-stream inputs); got {len(x)} tensors")
        ks = self.kernel_sizes
        if not isinstance(ks, (list, tuple)) or not ks:
            raise ValueError(f"pyconv 'kernel_sizes' must be a non-empty "
                             f"sequence of kernel sizes, got {ks!r}")
        kss = [tuple(int(v) for v in k) if isinstance(k, (list, tuple))
               else (int(k),) * (x.ndim - 2) for k in ks]
        if any(v % 2 == 0 for k in kss for v in k):
            # (k//2, k//2) padding grows the spatial size by 1 for even k,
            # breaking the constant-spatial-size contract (and the concat
            # across levels of mixed parity)
            raise ValueError(f"pyconv kernel sizes must be odd, got {ks!r}")
        n = len(kss)
        if isinstance(self.out_channels, (list, tuple)):
            chs = [int(c) for c in self.out_channels]
            if len(chs) != n:
                raise ValueError(f"pyconv: {len(chs)} out_channels entries "
                                 f"for {n} kernel sizes")
        else:
            total = int(self.out_channels)
            base, rem = divmod(total, n)
            chs = [base + (1 if i < rem else 0) for i in range(n)]
        if self.groups is None:
            # paper scheme: equal per-level cost => groups ~ (K_i/K_0)^2,
            # rounded to the nearest power of two (table 1: 1, 4, 8, 16)
            k0 = max(kss[0][0], 1)
            grs = [1 << max(0, math.ceil(math.log2(max((k[0] / k0) ** 2, 1))))
                   for k in kss]
        else:
            grs = ([int(g) for g in self.groups]
                   if isinstance(self.groups, (list, tuple))
                   else [int(self.groups)] * n)
        in_ch = x.shape[-1]
        outs = []
        for i, (k, c) in enumerate(zip(kss, chs)):
            g = max(1, grs[i])
            while g > 1 and (in_ch % g or c % g):
                g -= 1   # snap to a feasible divisor, like parallel_conv
            outs.append(fnn.Conv(
                c, k, padding=tuple((v // 2, v // 2) for v in k),
                feature_group_count=g, dtype=self.dtype,
                kernel_init=dnn.xavier_normal_with_gain(
                    dnn.get_gain(self.act_fn)),
                name=f"level{i}_k{k[0]}_conv")(x))
        y = jnp.concatenate(outs, axis=-1)
        layer = dnn.Layer(op=dnn.Identity(), act_fn=self.act_fn,
                          dropout_prob=self.dropout_prob,
                          preactivation=self.preactivation,
                          norms=tuple(dnn.normalization_techniques(
                              self.norm_specs or {}, dtype=self.dtype)),
                          name="mix_layer")
        return layer(y, train=train)


class MultiresolutionFusion(fnn.Module):
    """Fuse every stream into every resolution (reference hrnet.py:120-250).

    For target stream i, every source stream j contributes:
      * j == i: identity;
      * j < i (higher res -> lower): ``i - j`` strided 3x3 convs (stride 2),
        the first mapping to target channels;
      * j > i (lower res -> higher): bilinear upsample + 1x1 conv to target
        channels.
    Contributions are summed. ``create_new_branch`` appends a new stream at
    half the lowest resolution (strided conv from the lowest-res stream).
    ``reuse_scaling_convs`` shares scaling convs across (source-channels,
    target-channels, direction) signatures (reference weight-sharing option,
    hrnet.py:171-179).
    """
    create_new_branch: bool = True
    new_branch_channels: Optional[int] = None
    reuse_scaling_convs: bool = False
    act_fn: Optional[Callable] = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        streams = _as_streams(x)
        n = len(streams)
        chans = [s.shape[-1] for s in streams]
        conv_cache: Dict[Any, fnn.Module] = {}

        def get_conv(key_sig, make):
            if not self.reuse_scaling_convs:
                return make()  # unique conv per call site (tag-named)
            if key_sig not in conv_cache:
                conv_cache[key_sig] = make()
            return conv_cache[key_sig]

        def down_conv(in_ch, out_ch, tag):
            sig = ("down", in_ch, out_ch)
            return get_conv(sig, lambda: fnn.Conv(
                out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"down_{tag}" if not self.reuse_scaling_convs
                else f"down_shared_{in_ch}to{out_ch}"))

        def up_conv(in_ch, out_ch, tag):
            sig = ("up", in_ch, out_ch)
            return get_conv(sig, lambda: fnn.Conv(
                out_ch, (1, 1), dtype=self.dtype,
                name=f"up_{tag}" if not self.reuse_scaling_convs
                else f"up_shared_{in_ch}to{out_ch}"))

        outs = []
        for i in range(n):
            target_ch = chans[i]
            target_hw = streams[i].shape[1:-1]
            acc = streams[i]
            for j in range(n):
                if j == i:
                    continue
                s = streams[j]
                if j < i:  # downscale j -> i
                    steps = i - j
                    y = down_conv(s.shape[-1], target_ch, f"{j}to{i}_0")(s)
                    for k in range(1, steps):
                        y = down_conv(target_ch, target_ch, f"{j}to{i}_{k}")(y)
                else:      # upscale j -> i
                    y = dnn.interpolate(s, target_hw)
                    y = up_conv(s.shape[-1], target_ch, f"{j}to{i}")(y)
                acc = acc + y.astype(acc.dtype)
            if self.act_fn is not None:
                acc = self.act_fn(acc)
            outs.append(acc)

        if self.create_new_branch:
            src = streams[-1]
            nb_ch = int(self.new_branch_channels or 2 * src.shape[-1])
            y = down_conv(src.shape[-1], nb_ch, f"newbranch")(src)
            if self.act_fn is not None:
                y = self.act_fn(y)
            outs.append(y)
        return outs


class HRNetInputStem(fnn.Module):
    """N strided 3x3 convs halving resolution each (reference hrnet.py:325-347)."""
    out_channels: int = 64
    conv_count: int = 2
    act_fn: Optional[Callable] = None
    norm_specs: Optional[Mapping[str, Any]] = None
    dropout_prob: float = 0.0
    preactivation: bool = False
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = x[0]
        for i in range(int(self.conv_count)):
            op = fnn.Conv(int(self.out_channels), (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=self.dtype,
                          kernel_init=dnn.xavier_normal_with_gain(
                              dnn.get_gain(self.act_fn)),
                          name=f"stem_conv{i}")
            layer = dnn.Layer(op=op, act_fn=self.act_fn,
                              dropout_prob=self.dropout_prob,
                              preactivation=self.preactivation,
                              norms=tuple(dnn.normalization_techniques(
                                  self.norm_specs or {}, dtype=self.dtype)),
                              name=f"stem_layer{i}")
            x = layer(x, train=train)
        return x


class HRNetV1RepresentationHead(fnn.Module):
    """Keep only the highest-resolution stream (reference hrnet.py:253-266)."""
    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return _as_streams(x)[0]


class HRNetV2RepresentationHead(fnn.Module):
    """Upscale all streams to max res, concat, 1x1 mix
    (reference hrnet.py:269-301)."""
    out_channels: Optional[int] = None
    act_fn: Optional[Callable] = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        streams = _as_streams(x)
        hw = streams[0].shape[1:-1]
        ups = [streams[0]] + [dnn.interpolate(s, hw) for s in streams[1:]]
        cat = jnp.concatenate(ups, axis=-1)
        out_ch = int(self.out_channels or cat.shape[-1])
        y = fnn.Conv(out_ch, (1, 1), dtype=self.dtype, name="mix")(cat)
        if self.act_fn is not None:
            y = self.act_fn(y)
        return y


class HRNetV2pRepresentationHead(fnn.Module):
    """V2 head + strided-conv downscale pyramid — outputs a stream list
    (reference hrnet.py:304-322)."""
    out_channels: Optional[int] = None
    pyramid_levels: int = 3
    act_fn: Optional[Callable] = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        v2 = HRNetV2RepresentationHead(out_channels=self.out_channels,
                                       act_fn=self.act_fn, dtype=self.dtype,
                                       name="v2")(x, train=train)
        outs = [v2]
        y = v2
        for i in range(int(self.pyramid_levels) - 1):
            y = fnn.Conv(y.shape[-1], (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name=f"pyr{i}")(y)
            if self.act_fn is not None:
                y = self.act_fn(y)
            outs.append(y)
        return outs


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
