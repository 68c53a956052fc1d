"""Programmatic model-zoo builders on top of the YAML spec language.

The spec engine's tokens (named nodes, ``_from`` references,
``_new_branch_from_tensor``, residual links) are expressive enough for
canonical architectures; this module proves it by emitting the ResNet
family (He et al., arXiv:1512.03385) as plain architecture lists — the
same dicts a user could write in ``parameters.yml``, just generated.

Caveat vs the paper: the framework's layer unit applies op -> act -> norm
(the reference DeepCV ``layer()`` order, nn.py:519-554), not the paper's
conv -> bn -> relu. Parameter counts and FLOPs are identical (one norm per
conv, same shapes — resnet50() lands on torchvision's 25.557M exactly);
training quality differences between the two orders are small and
documented rather than hidden. Projection shortcuts are 1x1 convs on a
``_new_branch_from_tensor`` branch, the post-sum ReLU is an ``activation``
node.
"""
from __future__ import annotations

from typing import Any, Dict, List

__all__ = ["resnet_spec", "RESNET_LAYERS", "mobilenet_v2_spec",
           "MOBILENET_V2_SETTINGS", "efficientnet_b0_spec",
           "EFFICIENTNET_B0_SETTINGS", "mobilenet_v3_spec",
           "MOBILENET_V3_SETTINGS", "vit_spec", "VIT_SETTINGS",
           "convnext_spec", "CONVNEXT_SETTINGS", "swin_spec",
           "SWIN_SETTINGS", "densenet_spec", "DENSENET_SETTINGS",
           "unet_spec"]

#: blocks per stage for the standard depths
RESNET_LAYERS = {
    18: ((2, 2, 2, 2), "basic"),
    34: ((3, 4, 6, 3), "basic"),
    50: ((3, 4, 6, 3), "bottleneck"),
    101: ((3, 4, 23, 3), "bottleneck"),
    152: ((3, 8, 36, 3), "bottleneck"),
}


def _norm_hp(norm: str, num_groups: int = 8):
    """The builders' shared norm-technique spec (torch eps/momentum
    conventions; group count per family)."""
    return ({"momentum": 0.1, "eps": 1e-5} if norm == "batch_norm"
            else {"num_groups": num_groups, "eps": 1e-5})


def _conv(name, out_ch, k, stride=1, act=True, groups=1, bias=True):
    p: Dict[str, Any] = {"kernel_size": [k, k], "out_channels": out_ch,
                         "padding": k // 2}
    if stride != 1:
        p["stride"] = stride
    if groups != 1:
        p["groups"] = groups
    if not act:
        p["act_fn"] = None
    if not bias:
        p["use_bias"] = False
    return {"conv2d": [name, p]}


def resnet_spec(depth: int = 50, num_classes: int = 1000,
                norm: str = "batch_norm",
                width: int = 64, pool_kernel: int = 7,
                groups: int = 1, width_per_group: int = 64) -> Dict[str, Any]:
    """Full model hp dict (architecture + globals) for a ResNet of the given
    depth. ``norm`` picks the normalization technique globally ('batch_norm'
    canonical; 'group_norm' / None for the TPU-throughput variants measured
    in docs/design.md §5.9 — pair None with hp['weight_norm'] yourself).

    ``groups``/``width_per_group`` give the torchvision-exact variants of
    the bottleneck family: ResNeXt-50 32x4d = (50, groups=32,
    width_per_group=4) -> 25,028,904 params; Wide ResNet-50-2 = (50,
    width_per_group=128) -> 68,883,240 (both modulo the stem pad rows)."""
    if depth not in RESNET_LAYERS:
        raise ValueError(f"depth must be one of {sorted(RESNET_LAYERS)}")
    layers, kind = RESNET_LAYERS[depth]
    if (groups != 1 or width_per_group != 64) and kind != "bottleneck":
        raise ValueError("groups/width_per_group need a bottleneck depth "
                         "(50/101/152)")
    # canonical ResNet: conv biases off when a norm follows each conv
    bias = not bool(norm)
    arch: List[Any] = [
        _conv("stem", width, 7, stride=2, bias=bias),
        {"max_pooling": ["stem_pool", {"kernel_size": [3, 3],
                                       "stride": [2, 2], "padding": 1}]},
    ]
    expansion = 4 if kind == "bottleneck" else 1
    in_name = "stem_pool"  # previous block output node
    c_in = width

    for s, n_blocks in enumerate(layers):
        c_mid = width * 2 ** s
        c_out = c_mid * expansion
        for b in range(n_blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            blk = f"s{s}b{b}"
            prev = in_name  # block input (addressable for the shortcut)
            # ---- main path ------------------------------------------------ #
            if kind == "bottleneck":
                # torchvision Bottleneck width: planes * wpg/64 * groups
                c_w = int(c_mid * (width_per_group / 64.0)) * groups
                arch.append(_conv(f"{blk}_c1", c_w, 1, stride=1, bias=bias))
                arch.append(_conv(f"{blk}_c2", c_w, 3, stride=stride,
                                  groups=groups, bias=bias))
                arch.append(_conv(f"{blk}_c3", c_out, 1, act=False, bias=bias))
            else:
                arch.append(_conv(f"{blk}_c1", c_out, 3, stride=stride, bias=bias))
                arch.append(_conv(f"{blk}_c2", c_out, 3, act=False, bias=bias))
            main = f"{blk}_c3" if kind == "bottleneck" else f"{blk}_c2"
            # projection only when the shortcut must change shape (identity
            # otherwise — e.g. resnet18 stage 0, exactly like torchvision)
            needs_proj = b == 0 and (stride != 1 or c_in != c_out)
            if needs_proj:
                # ---- projection shortcut on a new branch from the input --- #
                arch.append({"_new_branch_from_tensor":
                             [f"{blk}_branch", {"_from": prev}]})
                arch.append(_conv(f"{blk}_proj", c_out, 1, stride=stride,
                                  act=False, bias=bias))
                arch.append({"residual_link":
                             [f"{blk}_sum", {"_from": main}]})
            else:
                arch.append({"residual_link":
                             [f"{blk}_sum", {"_from": prev}]})
            arch.append({"activation": [f"{blk}_out", {}]})
            in_name = f"{blk}_out"
            c_in = c_out

    # global average pool over the remaining spatial dims, then the head
    # (224 input -> 7 here; pass pool_kernel = input//32 for other sizes)
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None}})

    hp: Dict[str, Any] = {"act_fn": "relu", "architecture": arch}
    if norm:
        hp[norm] = _norm_hp(norm, num_groups=32)
    return hp


#: MobileNetV2 inverted-residual settings (arXiv:1801.04381 table 2):
#: (expansion t, out channels c, repeats n, first stride s)
MOBILENET_V2_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                         (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                         (6, 320, 1, 1))


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding (all widths multiples of 8, never
    rounding below 90% of the target)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def mobilenet_v2_spec(num_classes: int = 1000, width_mult: float = 1.0,
                      norm: str = "batch_norm", pool_kernel: int = 7,
                      dropout: float = 0.2) -> Dict[str, Any]:
    """MobileNetV2 (Sandler et al., arXiv:1801.04381) through the spec
    language — the depthwise/inverted-residual regime, a different TPU
    performance profile from ResNet (depthwise 3x3s run on the VPU, not the
    MXU). Blocks: [1x1 expand t*c_in + relu6] -> 3x3 DEPTHWISE
    (``groups`` = channels) stride s + relu6 -> 1x1 LINEAR project (no act)
    with an identity residual iff stride 1 and c_in == c_out; stem 3x3 s2,
    head 1x1 to 1280, global pool, dropout, classifier. Channel widths use
    torchvision's multiple-of-8 rounding, so width_mult=1.0 lands on
    torchvision mobilenet_v2's 3,504,872 params exactly (modulo the inert
    9*5*32 stem rows from the cin 3->8 lane padding, ops/nn.py).

    Same layer-unit caveat as :func:`resnet_spec` (op -> act -> norm order;
    identical parameter counts/FLOPs). ``pool_kernel`` = input_size // 32.
    """
    bias = not bool(norm)
    c_in = _make_divisible(32 * width_mult)
    arch: List[Any] = [_conv("stem", c_in, 3, stride=2, bias=bias)]
    in_name = "stem"

    for s, (t, c, n, stride0) in enumerate(MOBILENET_V2_SETTINGS):
        c_out = _make_divisible(c * width_mult)
        for b in range(n):
            stride = stride0 if b == 0 else 1
            blk = f"ir{s}b{b}"
            prev = in_name
            c_exp = c_in * t
            if t != 1:
                arch.append(_conv(f"{blk}_exp", c_exp, 1, bias=bias))
            arch.append(_conv(f"{blk}_dw", c_exp, 3, stride=stride,
                              groups=c_exp, bias=bias))
            # linear bottleneck: NO activation after the projection
            arch.append(_conv(f"{blk}_proj", c_out, 1, act=False, bias=bias))
            if stride == 1 and c_in == c_out:
                arch.append({"residual_link": [f"{blk}_sum", {"_from": prev}]})
                in_name = f"{blk}_sum"
            else:
                in_name = f"{blk}_proj"
            c_in = c_out

    arch.append(_conv("head", _make_divisible(1280 * max(1.0, width_mult)),
                      1, bias=bias))
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None,
                                     "dropout_prob": dropout}})

    hp: Dict[str, Any] = {"act_fn": "relu6", "architecture": arch,
                          "dropout_prob": 0.0}
    if norm:
        hp[norm] = _norm_hp(norm, num_groups=8)
    return hp


#: EfficientNet-B0 MBConv settings (Tan & Le, arXiv:1905.11946 table 1):
#: (expansion t, out channels c, repeats n, first stride s, kernel k)
EFFICIENTNET_B0_SETTINGS = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3),
                            (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
                            (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
                            (6, 320, 1, 1, 3))


def efficientnet_b0_spec(num_classes: int = 1000, norm: str = "batch_norm",
                         pool_kernel: int = 7,
                         dropout: float = 0.2) -> Dict[str, Any]:
    """EfficientNet-B0 (Tan & Le, arXiv:1905.11946) through the spec
    language: MBConv = the MobileNetV2 inverted residual + a
    squeeze-excitation cell between the depthwise conv and the linear
    projection (SE hidden width = block INPUT channels // 4, silu inside),
    silu activations, 3x3/5x5 depthwise kernels per stage. width_mult is
    fixed at B0's 1.0; ``pool_kernel`` = input_size // 32.

    Parameter count equals torchvision efficientnet_b0's 5,288,548 exactly
    modulo the inert stem lane-pad rows (cin 3->8, ops/nn.py). Same layer
    order caveat as :func:`resnet_spec` (op -> act -> norm; identical
    params/FLOPs). Stochastic depth (drop-path) is not emitted — it is
    parameter-free and a training-quality knob, not an architecture one.
    """
    bias = not bool(norm)
    c_in = _make_divisible(32)
    arch: List[Any] = [_conv("stem", c_in, 3, stride=2, bias=bias)]
    in_name = "stem"

    for s, (t, c, n, stride0, k) in enumerate(EFFICIENTNET_B0_SETTINGS):
        c_out = _make_divisible(c)
        for b in range(n):
            stride = stride0 if b == 0 else 1
            blk = f"mb{s}b{b}"
            prev = in_name
            c_exp = c_in * t
            if t != 1:
                arch.append(_conv(f"{blk}_exp", c_exp, 1, bias=bias))
            arch.append(_conv(f"{blk}_dw", c_exp, k, stride=stride,
                              groups=c_exp, bias=bias))
            # SE hidden = block INPUT channels // 4 = c_exp // (4*t)
            arch.append({"squeeze_cell": [f"{blk}_se",
                                          {"reduction_ratio": 4 * t}]})
            arch.append(_conv(f"{blk}_proj", c_out, 1, act=False, bias=bias))
            if stride == 1 and c_in == c_out:
                arch.append({"residual_link": [f"{blk}_sum", {"_from": prev}]})
                in_name = f"{blk}_sum"
            else:
                in_name = f"{blk}_proj"
            c_in = c_out

    arch.append(_conv("head", _make_divisible(1280), 1, bias=bias))
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None,
                                     "dropout_prob": dropout}})

    hp: Dict[str, Any] = {"act_fn": "silu", "architecture": arch,
                          "dropout_prob": 0.0}
    if norm:
        hp[norm] = _norm_hp(norm, num_groups=8)
    return hp


#: MobileNetV3 per-block settings (Howard et al., arXiv:1905.02244 tables
#: 1-2, torchvision _mobilenet_v3_conf ordering): each row is
#: (kernel k, expanded channels, out channels, use_se, act name, stride).
#: The classifier hidden width (1280 large / 1024 small) follows the rows.
MOBILENET_V3_SETTINGS = {
    "large": (((3, 16, 16, False, "relu", 1),
               (3, 64, 24, False, "relu", 2),
               (3, 72, 24, False, "relu", 1),
               (5, 72, 40, True, "relu", 2),
               (5, 120, 40, True, "relu", 1),
               (5, 120, 40, True, "relu", 1),
               (3, 240, 80, False, "hard_swish", 2),
               (3, 200, 80, False, "hard_swish", 1),
               (3, 184, 80, False, "hard_swish", 1),
               (3, 184, 80, False, "hard_swish", 1),
               (3, 480, 112, True, "hard_swish", 1),
               (3, 672, 112, True, "hard_swish", 1),
               (5, 672, 160, True, "hard_swish", 2),
               (5, 960, 160, True, "hard_swish", 1),
               (5, 960, 160, True, "hard_swish", 1)), 1280),
    "small": (((3, 16, 16, True, "relu", 2),
               (3, 72, 24, False, "relu", 2),
               (3, 88, 24, False, "relu", 1),
               (5, 96, 40, True, "hard_swish", 2),
               (5, 240, 40, True, "hard_swish", 1),
               (5, 240, 40, True, "hard_swish", 1),
               (5, 120, 48, True, "hard_swish", 1),
               (5, 144, 48, True, "hard_swish", 1),
               (5, 288, 96, True, "hard_swish", 2),
               (5, 576, 96, True, "hard_swish", 1),
               (5, 576, 96, True, "hard_swish", 1)), 1024),
}


def mobilenet_v3_spec(variant: str = "large", num_classes: int = 1000,
                      width_mult: float = 1.0, norm: str = "batch_norm",
                      pool_kernel: int = 7,
                      dropout: float = 0.2) -> Dict[str, Any]:
    """MobileNetV3 (Howard et al., arXiv:1905.02244) through the spec
    language. Over MobileNetV2's inverted residual it adds: hard_swish
    activations on the later stages (relu on the early 'RE' rows), 5x5
    depthwise kernels, and SE cells between the depthwise conv and the
    linear projection — MobileNetV3's SE flavor: squeeze width
    ``_make_divisible(c_exp // 4, 8)`` (pinned via ``hidden_channels``),
    relu inside, HARD-sigmoid gate. Head: 1x1 conv to 6x the last block
    width (+ norm + hard_swish), global pool, then a NORM-FREE classifier
    pair FC(-> 1280 large / 1024 small) + hard_swish + dropout +
    FC(-> classes) — torchvision puts no BN on these, so neither do we.

    Parameter counts at width_mult=1.0 equal torchvision's
    mobilenet_v3_large 5,483,032 / mobilenet_v3_small 2,542,856 exactly
    modulo the inert 9*5*16 stem rows from cin 3->8 lane padding
    (ops/nn.py). Same layer-unit caveat as :func:`resnet_spec`
    (op -> act -> norm order; identical params/FLOPs). ``pool_kernel`` =
    input_size // 32.
    """
    if variant not in MOBILENET_V3_SETTINGS:
        raise ValueError(f"variant must be one of "
                         f"{sorted(MOBILENET_V3_SETTINGS)}, got {variant!r}")
    settings, last_channel = MOBILENET_V3_SETTINGS[variant]

    def adj(v):                    # torchvision adjust_channels
        return _make_divisible(v * width_mult)

    bias = not bool(norm)
    c_in = adj(16)
    arch: List[Any] = [_conv("stem", c_in, 3, stride=2, bias=bias)]
    in_name = "stem"

    for i, (k, exp, c, use_se, act, stride) in enumerate(settings):
        c_exp, c_out = adj(exp), adj(c)
        blk = f"ir{i}"
        prev = in_name
        for nm, spec in (
                [(f"{blk}_exp", _conv(f"{blk}_exp", c_exp, 1, bias=bias))]
                if c_exp != c_in else []) + [
                (f"{blk}_dw", _conv(f"{blk}_dw", c_exp, k, stride=stride,
                                    groups=c_exp, bias=bias))]:
            if act != "hard_swish":      # global act is hard_swish
                spec["conv2d"][1]["act_fn"] = act
            arch.append(spec)
        if use_se:
            arch.append({"squeeze_cell": [
                f"{blk}_se", {"hidden_channels": _make_divisible(c_exp // 4),
                              "act_fn": "relu", "gate_fn": "hard_sigmoid"}]})
        arch.append(_conv(f"{blk}_proj", c_out, 1, act=False, bias=bias))
        if stride == 1 and c_in == c_out:
            arch.append({"residual_link": [f"{blk}_sum", {"_from": prev}]})
            in_name = f"{blk}_sum"
        else:
            in_name = f"{blk}_proj"
        c_in = c_out

    arch.append(_conv("head", 6 * c_in, 1, bias=bias))
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": [
        "pre_classifier", {"out_features": adj(last_channel),
                           "batch_norm": None, "group_norm": None}]})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None,
                                     "dropout_prob": dropout}})

    hp: Dict[str, Any] = {"act_fn": "hard_swish", "architecture": arch,
                          "dropout_prob": 0.0}
    if norm:
        hp[norm] = _norm_hp(norm, num_groups=8)
    return hp


#: ViT variants (Dosovitskiy et al., arXiv:2010.11929; torchvision naming):
#: (patch, layers, heads, hidden dim, mlp dim)
VIT_SETTINGS = {
    "b_16": (16, 12, 12, 768, 3072),
    "b_32": (32, 12, 12, 768, 3072),
    "l_16": (16, 24, 16, 1024, 4096),
    "l_32": (32, 24, 16, 1024, 4096),
    "h_14": (14, 32, 16, 1280, 5120),
}


def vit_spec(variant: str = "b_16", num_classes: int = 1000,
             dropout: float = 0.0, attn_dropout: float = 0.0,
             stochastic_depth: float = 0.0,
             attn_impl: str = "xla",
             moe_experts: int = 0, moe_every: int = 2, moe_k: int = 1,
             moe_capacity_factor: float = 1.25,
             moe_router_noise: float = 0.0,
             moe_group_size: int = 0,
             mlp_act: str = "gelu",
             norm: str = "layer_norm") -> Dict[str, Any]:
    """Vision Transformer through the spec language — the attention-family
    counterpart to the CNN zoo (the reference is CNN-only, SURVEY §5.7).

    Wiring is torchvision's ``VisionTransformer``: patch embed (+[cls] +
    learned position table), ``layers`` pre-LN encoder blocks (exact-GELU
    MLP), final LayerNorm (eps 1e-6), [cls] token -> Linear head. At
    224x224 input the parameter counts equal torchvision exactly —
    vit_b_16 86,567,656 / vit_b_32 88,224,232 / vit_l_16 304,326,632 /
    vit_l_32 306,535,400 / vit_h_14 632,045,800 — with NO inert pad rows: patch embedding is a
    reshape + Dense (ops/attention.py:PatchEmbed), so the conv-stem lane
    padding the CNN families document does not arise. The position table
    is sized from the actual input (token count is static at build), so
    other input sizes simply shift the count by (T - 197) * hidden.

    ``attn_impl='flash'`` routes every block through the Pallas
    online-softmax kernel (ops/attention.py:flash_attention) — measured
    against the XLA path in ``bench.py --config 11``.

    ``moe_experts=E`` (E > 0) builds **V-MoE** (Riquelme et al.,
    arXiv:2106.05974): every ``moe_every``-th block's dense MLP becomes a
    top-``moe_k`` mixture of E expert MLPs (ops/moe.py — static-shape
    einsum routing, f32 router, Switch load-balance aux loss wired into
    ``train()`` via ``hp['moe_aux_weight']``). ``moe_group_size`` bounds
    the routing-group size in tokens (0 = one global group — exact but
    quadratic in memory; set a few hundred for real training). Shard the
    stacked expert weights with ``parallel.expert_parallel_rules`` for EP.
    """
    if variant not in VIT_SETTINGS:
        raise ValueError(f"variant must be one of {sorted(VIT_SETTINGS)}, "
                         f"got {variant!r}")
    patch, layers, heads, hidden, mlp = VIT_SETTINGS[variant]
    arch: List[Any] = [
        {"patch_embed": ["embed", {"patch_size": patch, "embed_dim": hidden,
                                   "dropout_prob": dropout}]},
    ]
    for i in range(layers):
        # stochastic depth with the standard linear ramp: block i drops its
        # residual branches with prob p * i / (L - 1) (timm convention)
        dp = stochastic_depth * i / max(1, layers - 1)
        node = {"num_heads": heads, "mlp_dim": mlp,
                "dropout_prob": dropout,
                "attn_dropout_prob": attn_dropout,
                "drop_path_prob": round(dp, 6),
                "attn_impl": attn_impl}
        if mlp_act != "gelu":
            # 'gelu_tanh' = timm's approximate GELU: measured ~23% faster
            # MLP stack on v5e (benchmarks/_vit_ablate.py); exact erf GELU
            # stays the default for torchvision parity
            node["mlp_act"] = mlp_act
        if norm != "layer_norm":
            # 'rms_norm': scale-only, single-reduction norm — the cheap
            # TPU form (design.md §5.13: activation norms are pure HBM
            # traffic). LayerNorm stays default for torchvision parity.
            node["norm"] = norm
        # V-MoE placement: every moe_every-th block, counted from the back
        # (the paper puts experts in the later blocks)
        if moe_experts and (layers - 1 - i) % max(1, int(moe_every)) == 0:
            node["moe"] = {"num_experts": int(moe_experts), "k": int(moe_k),
                           "capacity_factor": float(moe_capacity_factor),
                           "router_noise": float(moe_router_noise),
                           "group_size": int(moe_group_size)}
        arch.append({"transformer_block": [f"enc{i}", node]})
    arch.append({"norm": ["final_ln", {norm: {"eps": 1e-6}}]})
    arch.append({"take_token": {"index": 0}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None}})
    # global act_fn is unused by the transformer nodes (the MLP's exact
    # GELU is internal) but required by the engine; dropout rides per-node.
    return {"act_fn": "gelu", "architecture": arch, "dropout_prob": 0.0}


#: ConvNeXt variants (Liu et al., arXiv:2201.03545; torchvision naming):
#: (blocks per stage, dims per stage)
CONVNEXT_SETTINGS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


def convnext_spec(variant: str = "tiny", num_classes: int = 1000,
                  stochastic_depth: float = 0.1,
                  pool_kernel: int = 7,
                  norm: str = "layer_norm") -> Dict[str, Any]:
    """ConvNeXt through the spec language — the modern-CNN zoo family
    (depthwise 7x7 + LayerNorm + inverted 4x MLP + layer scale + drop
    path). The patchify stem is a reshape + Dense (ops/nn.ConvNeXtStem) so
    NO inert lane-pad rows arise; parameter counts equal torchvision
    exactly. ``stochastic_depth`` ramps linearly over all blocks (timm
    convention; 0.1 is torchvision's convnext_tiny default). Head: global
    average pool -> flatten -> LayerNorm(1e-6) -> Linear. ``pool_kernel``
    = input_size // 32."""
    if variant not in CONVNEXT_SETTINGS:
        raise ValueError(f"variant must be one of "
                         f"{sorted(CONVNEXT_SETTINGS)}, got {variant!r}")
    blocks, dims = CONVNEXT_SETTINGS[variant]
    total = sum(blocks)
    arch: List[Any] = [
        {"convnext_stem": ["stem", {"dim": dims[0], "patch": 4}]},
    ]
    bi = 0
    for s, (n_blocks, dim) in enumerate(zip(blocks, dims)):
        if s > 0:
            arch.append({"convnext_downsample": [f"down{s}", {"dim": dim}]})
        for b in range(n_blocks):
            dp = stochastic_depth * bi / max(1, total - 1)
            node: Dict[str, Any] = {"drop_path_prob": round(dp, 6)}
            if norm != "layer_norm":
                # 'rms_norm' block norms (§5.13 lever); stem/downsample/head
                # norms stay LN (5 tensors vs the blocks' one-per-block)
                node["norm"] = norm
            arch.append({"convnext_block": [f"s{s}b{b}", node]})
            bi += 1
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"norm": ["head_ln", {"layer_norm": {"eps": 1e-6}}]})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None}})
    return {"act_fn": "gelu_exact", "architecture": arch,
            "dropout_prob": 0.0}


#: Swin variants (Liu et al., arXiv:2103.14030; torchvision naming):
#: (embed dim, depths per stage, heads per stage)
SWIN_SETTINGS = {
    "t": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "s": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "b": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
}


def swin_spec(variant: str = "t", num_classes: int = 1000,
              window: int = 7, stochastic_depth: float = 0.2,
              pool_kernel: int = 7,
              norm: str = "layer_norm") -> Dict[str, Any]:
    """Swin Transformer through the spec language — hierarchical windowed
    attention (the seventh zoo family; the attention counterpart of the
    CNN pyramids). Patchify stem (reshape + Dense + LN — the ConvNeXt stem
    cell at Swin's eps), stages of W-MSA/SW-MSA pairs (shift = window // 2
    on odd blocks, relative-position bias inside windows), PatchMerging
    (2x2 concat + LN + bias-free 2C Linear) between stages, final LN on
    the map, global pool, Linear head. Stochastic depth ramps linearly
    over all blocks (torchvision's 0.2 default for swin_t).

    Parameter counts at 224 equal torchvision exactly — swin_t 28,288,354
    (hand-derived and asserted in tests) — with zero pad rows.
    ``pool_kernel`` = input_size // 32. Feature maps must stay divisible
    by ``window`` at every stage (224 -> 56/28/14/7 with window 7)."""
    if variant not in SWIN_SETTINGS:
        raise ValueError(f"variant must be one of {sorted(SWIN_SETTINGS)}, "
                         f"got {variant!r}")
    dim, depths, heads = SWIN_SETTINGS[variant]
    total = sum(depths)
    arch: List[Any] = [
        {"convnext_stem": ["stem", {"dim": dim, "patch": 4,
                                    "ln_eps": 1e-5}]},
    ]
    bi = 0
    for s, (n_blocks, nh) in enumerate(zip(depths, heads)):
        if s > 0:
            arch.append({"patch_merging": [f"merge{s}", {}]})
        for b in range(n_blocks):
            dp = stochastic_depth * bi / max(1, total - 1)
            node = {"num_heads": nh, "window": window,
                    "shift": 0 if b % 2 == 0 else window // 2,
                    "drop_path_prob": round(dp, 6)}
            if norm != "layer_norm":
                # 'rms_norm' block norms (the §5.13 lever); stem/merge/head
                # norms stay LN (4 tensors vs the blocks' 2*depth)
                node["norm"] = norm
            arch.append({"swin_block": [f"s{s}b{b}", node]})
            bi += 1
    arch.append({"norm": ["head_ln", {"layer_norm": {"eps": 1e-5}}]})
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None}})
    return {"act_fn": "gelu_exact", "architecture": arch,
            "dropout_prob": 0.0}


#: DenseNet variants (Huang et al., arXiv:1608.06993; torchvision naming):
#: (growth rate k, layers per dense block)
DENSENET_SETTINGS = {
    121: (32, (6, 12, 24, 16)),
    169: (32, (6, 12, 32, 32)),
    201: (32, (6, 12, 48, 32)),
}


def densenet_spec(depth: int = 121, num_classes: int = 1000,
                  norm: str = "batch_norm",
                  pool_kernel: int = 7) -> Dict[str, Any]:
    """DenseNet through the spec language — the showcase for the
    reference's OWN signature mechanism: every dense-block layer's input
    is a ``dense_link`` concat of the block input and all previous layer
    outputs (the spec token the reference built its language around,
    submodule_creators.py:272-332, here driving a canonical architecture
    at scale). Layers are BN-ReLU-Conv via ``preactivation: true`` — the
    one zoo family whose op order matches torch EXACTLY (no op->act->norm
    caveat): bottleneck 1x1 to 4k, then 3x3 to k=growth, transitions
    halve channels + avg-pool, final BN-ReLU before the classifier.

    Parameter counts equal torchvision exactly modulo the inert stem
    lane-pad rows (cin 3->8): densenet121 7,978,856 / densenet169
    14,149,480 / densenet201 20,013,928. ``pool_kernel`` =
    input_size // 32."""
    if depth not in DENSENET_SETTINGS:
        raise ValueError(f"depth must be one of {sorted(DENSENET_SETTINGS)}, "
                         f"got {depth}")
    k, blocks = DENSENET_SETTINGS[depth]
    c = 2 * k

    norm = norm or "batch_norm"     # preactivation needs SOME norm
    norm_spec = _norm_hp(norm)

    def pre_conv(name, out_ch, ksize):
        return {"conv2d": [name, {"kernel_size": [ksize, ksize],
                                  "out_channels": out_ch,
                                  "padding": ksize // 2,
                                  "use_bias": False,
                                  "preactivation": True}]}

    # stem in torch's exact order: conv0 -> norm0 -> relu0 -> pool0
    # (standalone norm + activation nodes keep the order faithful; a layer
    # unit would emit conv -> relu -> BN)
    arch: List[Any] = [
        {"conv2d": ["stem", {"kernel_size": [7, 7], "out_channels": c,
                             "stride": 2, "padding": 3, "use_bias": False,
                             "act_fn": None, "batch_norm": None}]},
        {"norm": ["stem_bn", {norm: dict(norm_spec)}]},
        {"activation": ["stem_relu", {}]},
        {"max_pooling": ["stem_pool", {"kernel_size": [3, 3],
                                       "stride": [2, 2], "padding": 1}]},
    ]
    in_name = "stem_pool"
    for s, n_layers in enumerate(blocks):
        feats = [in_name]            # the dense block's growing feature set
        for l in range(n_layers):
            blk = f"d{s}l{l}"
            if len(feats) > 1:
                # full dense connectivity: restart the stream from the
                # concat of the block input + every earlier output, in
                # TORCH's channel order [input, out0, out1, ...] (the
                # listed-_from order; dense_link would put the current
                # stream first, permuting channels vs torch checkpoints)
                arch.append({"_new_branch_from_tensor":
                             [f"{blk}_cat", {"_from": list(feats),
                                             "reduction": "concat"}]})
            arch.append(pre_conv(f"{blk}_b", 4 * k, 1))
            arch.append(pre_conv(f"{blk}_c", k, 3))
            feats.append(f"{blk}_c")
        c = c + n_layers * k
        # final concat of the block feeds the transition / head
        arch.append({"_new_branch_from_tensor":
                     [f"t{s}_in", {"_from": list(feats),
                                   "reduction": "concat"}]})
        if s < len(blocks) - 1:
            c = c // 2
            arch.append(pre_conv(f"t{s}_conv", c, 1))
            arch.append({"average_pooling": [f"t{s}_pool",
                                             {"kernel_size": [2, 2],
                                              "stride": [2, 2]}]})
            in_name = f"t{s}_pool"
    # final BN-ReLU (torch: features.norm5 + relu), pool, classifier
    arch.append({"norm": ["final_bn", {norm: dict(norm_spec)}]})
    arch.append({"activation": ["final_relu", {}]})
    arch.append({"average_pooling": {"kernel_size": [pool_kernel, pool_kernel],
                                     "stride": [pool_kernel, pool_kernel]}})
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": num_classes,
                                     "act_fn": None, "batch_norm": None,
                                     "group_norm": None}})
    hp: Dict[str, Any] = {"act_fn": "relu", "architecture": arch,
                          "dropout_prob": 0.0}
    hp[norm] = dict(norm_spec)
    return hp


def unet_spec(depth: int = 4, base_channels: int = 32,
              norm: str = "group_norm") -> Dict[str, Any]:
    """U-Net (Ronneberger et al., arXiv:1505.04597) through the spec
    language: the encoder halves resolution per level (double conv +
    pool), the decoder bilinearly upsamples (``interpolate`` node) and
    concatenates the matching encoder feature via ``dense_link`` — skip
    connections are exactly the reference's signature ref mechanism. The
    output keeps the INPUT resolution and ``base_channels`` width; pair it
    with the dense-prediction heads (create_segmenter/create_pose_estimator
    append the 1x1 class conv). Input H/W must be divisible by 2**depth.
    GroupNorm default (segmentation batches are small; BN stats would be
    noisy) — pass norm='batch_norm' or None to override."""
    arch: List[Any] = []
    c = int(base_channels)
    bias = not bool(norm)   # zoo convention: biases off when a norm follows

    def double_conv(prefix, out_ch):
        arch.append(_conv(f"{prefix}a", out_ch, 3, bias=bias))
        arch.append(_conv(f"{prefix}b", out_ch, 3, bias=bias))

    enc_names = []
    for d in range(depth):
        double_conv(f"enc{d}_", c * 2 ** d)
        enc_names.append(f"enc{d}_b")
        arch.append({"max_pooling": {"kernel_size": [2, 2],
                                     "stride": [2, 2]}})
    double_conv("mid_", c * 2 ** depth)
    for d in reversed(range(depth)):
        arch.append({"interpolate": {"scale": 2}})
        arch.append({"dense_link": [f"dec{d}_cat",
                                    {"_from": enc_names[d]}]})
        double_conv(f"dec{d}_", c * 2 ** d)

    hp: Dict[str, Any] = {"act_fn": "relu", "architecture": arch,
                          "dropout_prob": 0.0}
    if norm:
        hp[norm] = _norm_hp(norm, num_groups=8)
    return hp
