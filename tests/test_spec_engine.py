"""Spec-engine tests: parsing, validation, execution semantics, NAS modes.

Mirrors the reference's construction-time validation behavior
(nn_spec.py:98-101, 209-210; submodule_creators.py:146-158) plus golden
behavior checks on links/branches the reference could not test (its forward
had the §8 early-return bug).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule, SpecError
from deepcv_tpu.spec.module import DeepcvModuleWithSharedImageBlock

BASIC = """
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
  - avg_pooling: ["pool1", { kernel_size: [2, 2], stride: [2, 2] }]
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - flatten: {}
  - fully_connected: { act_fn: sigmoid, out_features: 10 }
"""


def build(yml, shape=(16, 16, 3), **kw):
    return DeepcvModule(shape, load_yaml(yml), **kw)


def test_sequential_model_builds_and_runs(rng):
    m = build(BASIC)
    assert m.is_sequential_nn
    v = m.init(rng)
    y = m.apply(v, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 10)
    assert m.eval_output_shape() == (1, 10)


def test_jit_forward(rng):
    m = build(BASIC)
    v = m.init(rng)
    f = jax.jit(lambda vv, x: m.apply(vv, x))
    y = f(v, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 10)


def test_dense_link_concats_channels(rng):
    m = build("""
act_fn: relu
architecture:
  - conv2d: ["c1", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - dense_link: { _from: "c1" }
""")
    assert m.eval_output_shape()[-1] == 12  # 8 + 4 channels


def test_dense_link_rescales_when_allowed(rng):
    m = build("""
act_fn: relu
architecture:
  - conv2d: ["c1", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
  - dense_link: { _from: "c1", allow_scaling: true }
""")
    shape = m.eval_output_shape()
    assert shape == (1, 8, 8, 8)  # pooled 8x8, channels 4+4


def test_dense_link_raises_without_scaling():
    m = build("""
act_fn: relu
architecture:
  - conv2d: ["c1", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
  - dense_link: { _from: "c1", allow_scaling: false }
""")
    with pytest.raises(ValueError, match="allow_scaling"):
        m.eval_output_shape()


def test_residual_link_adds(rng):
    m = build("""
act_fn: identity
architecture:
  - conv2d: ["c1", { kernel_size: [1, 1], out_channels: 3, padding: 0 }]
  - residual_link: { _from: "c1" }
""")
    v = m.init(rng)
    x = jnp.ones((1, 4, 4, 3))
    y = m.apply(v, x)
    # residual: y = c1(x) + c1(x) = 2*c1(x)
    c1_only = build("""
act_fn: identity
architecture:
  - conv2d: { kernel_size: [1, 1], out_channels: 3, padding: 0 }
""")
    # can't share params across differently-named trees; just check shape+determinism
    assert y.shape == x.shape


def test_residual_mean_reduction_multi_ref(rng):
    m = build("""
act_fn: identity
architecture:
  - conv2d: ["a", { kernel_size: [1, 1], out_channels: 3, padding: 0 }]
  - conv2d: ["b", { kernel_size: [1, 1], out_channels: 3, padding: 0 }]
  - residual_link: { _from: ["a", "b"], reduction: "mean" }
""")
    v = m.init(rng)
    y = m.apply(v, jnp.ones((1, 4, 4, 3)))
    assert y.shape == (1, 4, 4, 3)


def test_new_branch_from_tensor(rng):
    m = build("""
act_fn: relu
architecture:
  - conv2d: ["trunk", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - _new_branch_from_tensor: { _from: "trunk" }
  - conv2d: { kernel_size: [3, 3], out_channels: 2, padding: 1 }
""")
    # new branch restarts from trunk's 4-channel output, so final conv sees 4 ch
    assert m.eval_output_shape() == (1, 16, 16, 2)


def test_undefined_reference_raises():
    with pytest.raises(SpecError, match="undefined"):
        build("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
  - dense_link: { _from: "nope" }
""")


def test_duplicate_name_raises():
    with pytest.raises(SpecError, match="Duplicate"):
        build("""
act_fn: relu
architecture:
  - conv2d: ["same", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - conv2d: ["same", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
""")


def test_unknown_creator_param_raises():
    with pytest.raises(ValueError, match="unexpected param"):
        build("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, bogus_param: 1 }
""")


def test_missing_required_param_raises():
    with pytest.raises(ValueError, match="required"):
        build("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3] }
""")


def test_nested_module(rng):
    m = build("""
act_fn: leaky_relu
dropout_prob: 0.0
architecture:
  - _nested_deepcvmodule:
      act_fn: relu
      architecture:
        - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
        - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
  - flatten: {}
  - fully_connected: { act_fn: sigmoid, out_features: 5 }
""")
    v = m.init(rng)
    y = m.apply(v, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 5)


def test_tagged_module_entry(rng):
    m = build("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
  - !py!torch.nn.Flatten
  - fully_connected: { act_fn: sigmoid, out_features: 3 }
""")
    assert m.eval_output_shape() == (1, 3)


def test_nas_layer_choice_fixed_default_first(rng):
    yml = """
act_fn: relu
architecture:
  - _nas_layer_choice:
      _name: "mut1"
      _candidates:
        - conv2d: { kernel_size: [3, 3], out_channels: 32, padding: 1 }
        - conv2d: { kernel_size: [5, 5], out_channels: 16, padding: 2 }
"""
    m = build(yml)
    assert m.eval_output_shape()[-1] == 32  # first candidate default
    m2 = DeepcvModule((16, 16, 3), load_yaml(yml), nas_arch={"mut1": 1})
    assert m2.eval_output_shape()[-1] == 16


def test_nas_layer_choice_supernet(rng):
    yml = """
act_fn: relu
architecture:
  - _nas_layer_choice:
      _name: "mut1"
      _candidates:
        - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
        - conv2d: { kernel_size: [5, 5], out_channels: 8, padding: 2 }
"""
    m = DeepcvModule((16, 16, 3), load_yaml(yml), nas_mode="supernet")
    v = m.init(rng)
    assert "arch__mut1" in v["params"]
    y = m.apply(v, jnp.ones((1, 16, 16, 3)))
    assert y.shape == (1, 16, 16, 8)


def test_nas_input_choice_fixed(rng):
    yml = """
act_fn: relu
architecture:
  - avg_pooling: ["p1", { kernel_size: [2, 2], stride: [2, 2] }]
  - conv2d: ["c1", { kernel_size: [3, 3], out_channels: 3, padding: 1 }]
  - conv2d: { kernel_size: [3, 3], out_channels: 3, padding: 1 }
  - residual_link: { _from_nas_input_choice: ["p1", "c1"], reduction: "mean", allow_scaling: true }
"""
    m = build(yml)
    v = m.init(jax.random.PRNGKey(0))
    y = m.apply(v, jnp.ones((1, 16, 16, 3)))
    assert y.shape == (1, 8, 8, 3)
    # explicit arch choice of the second input
    m2 = DeepcvModule((16, 16, 3), load_yaml(yml),
                      nas_arch={"_submodule_3_residual_link": [1]})
    v2 = m2.init(jax.random.PRNGKey(0))
    assert m2.apply(v2, jnp.ones((1, 16, 16, 3))).shape == (1, 8, 8, 3)


def test_batch_norm_state_updates(rng):
    m = build("""
act_fn: relu
batch_norm: { affine: true, eps: 1e-05, momentum: 0.1 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
""")
    v = m.init(rng)
    assert "batch_stats" in v
    x = jax.random.normal(rng, (4, 16, 16, 3))
    y, new_state = m.apply(v, x, train=True)
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_spectral_norm_wraps(rng):
    m = build("""
act_fn: relu
spectral_norm: { n_power_iterations: 2, eps: 1e-12 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
""")
    v = m.init(rng)
    assert "batch_stats" in v  # spectral norm keeps u/sigma in batch_stats
    y, _ = m.apply(v, jnp.ones((1, 8, 8, 3)), train=True)
    assert y.shape == (1, 8, 8, 4)


def test_dropout_active_only_in_train(rng):
    m = build("""
act_fn: identity
dropout_prob: 0.5
architecture:
  - conv2d: { kernel_size: [1, 1], out_channels: 4, padding: 0 }
""")
    v = m.init(rng)
    x = jnp.ones((2, 8, 8, 3))
    y_eval1 = m.apply(v, x)
    y_eval2 = m.apply(v, x)
    assert np.allclose(y_eval1, y_eval2)
    y_tr = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(y_eval1, y_tr)


def test_descriptor(rng):
    m = build(BASIC)
    d = m.describe()
    assert d.capacity > 0
    assert d.features_shapes["pool1"] == (1, 8, 8, 4)
    s = str(d)
    assert "pool1" in s and "capacity" in s


def test_shared_image_block(rng):
    hp = load_yaml("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
""")
    m = DeepcvModuleWithSharedImageBlock((16, 16, 3), hp)
    v = m.init(rng)
    assert m.SHARED_SCOPE in v["params"]
    y = m.apply(v, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 16, 16, 4)
    # share into a second model
    m2 = DeepcvModuleWithSharedImageBlock((16, 16, 3), hp)
    v2 = m2.init(jax.random.PRNGKey(9))
    shared = m.extract_shared_params(v)
    v2b = m2.inject_shared_params(v2, shared)
    y2 = m2.apply(v2b, jnp.ones((2, 16, 16, 3)))
    assert y2.shape == (2, 16, 16, 4)


def test_reference_image_classifier_spec_builds(rng):
    """Build the reference's own image_classifier model (parameters.yml:79-88
    with basic_backbone:8-19), out_features injected like
    classification/image.py:40-53 does."""
    from deepcv_tpu.config import load_yaml as ly
    from pathlib import Path
    ref = Path("/root/reference/conf/base/parameters.yml")
    if not ref.exists():
        pytest.skip("reference not mounted")
    doc = ly(ref)
    models = {k: v for d in doc["models"] for k, v in d.items()}
    hp = dict(models["image_classifier"])
    # inject classifier width (reference create_model injects from dataset)
    hp["architecture"][-1]["fully_connected"]["out_features"] = 10
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(rng)
    y, _ = m.apply(v, jnp.ones((2, 32, 32, 3)), train=True,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    assert y.shape == (2, 10)


def test_select_tensor_and_reduce_on_streams(rng):
    """select_tensor slices parallel-stream lists; reduce('none') passes the
    list through (reference submodule_creators.py:179-200)."""
    m = build("""
act_fn: relu
architecture:
  - hrnet_input_stem: { out_channels: 8, conv_count: 1 }
  - multiresolution_fusion: { create_new_branch: true, new_branch_channels: 8 }
  - multiresolution_fusion: { create_new_branch: true, new_branch_channels: 8 }
  - select_tensor: { slice: "1:3" }
  - reduce: { reduction: "none" }
""", shape=(16, 16, 3))
    v = m.init(rng)
    y = m.apply(v, jnp.ones((2, 16, 16, 3)))
    assert isinstance(y, list) and len(y) == 2
    assert y[0].shape == (2, 4, 4, 8) and y[1].shape == (2, 2, 2, 8)


def test_select_single_stream(rng):
    m = build("""
act_fn: relu
architecture:
  - hrnet_input_stem: { out_channels: 8, conv_count: 1 }
  - multiresolution_fusion: { create_new_branch: true, new_branch_channels: 8 }
  - select_tensor: { slice: "0" }
  - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
""", shape=(16, 16, 3))
    assert m.eval_output_shape() == (1, 8, 8, 4)


def test_conv_with_meta_layer(rng):
    m = build("""
act_fn: relu
architecture:
  - conv_with_meta_layer: { out_channels: 8, kernel_size: [3, 3], meta_hidden: 16 }
""", shape=(8, 8, 3))
    v = m.init(rng)
    y = m.apply(v, jnp.ones((2, 8, 8, 3)))
    assert y.shape == (2, 8, 8, 8)
    # meta params exist
    node = v["params"]["node_impls__submodule_0_conv_with_meta_layer"]
    assert "meta_gamma" in node and "conv" in node


def test_reference_hrnet_spec_fails_with_clear_error():
    """The reference's own hrnet_backbone YAML (parameters.yml:53-77) has a
    channel inconsistency (16ch stem vs 32ch parallel streams feeding a
    no-scaling residual link, SURVEY §8). Our build must fail with a TARGETED
    message at trace time, not an opaque XLA error (the corrected spec lives
    in conf/base/parameters.yml)."""
    from pathlib import Path
    ref = Path("/root/reference/conf/base/parameters.yml")
    if not ref.exists():
        pytest.skip("reference not mounted")
    doc = load_yaml(ref)
    models = {k: v for d in doc["models"] for k, v in d.items()}
    m = DeepcvModule((64, 64, 3), models["hrnet_backbone"])  # builds fine
    with pytest.raises(ValueError, match="channel mismatch"):
        m.eval_output_shape()


def test_weight_norm_global(rng):
    m = build("""
act_fn: relu
weight_norm: { eps: 1e-12 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
""", shape=(8, 8, 3))
    v = m.init(rng)
    # WeightNorm adds a scale param alongside the kernel
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    names = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert any("scale" in n.lower() for n in names), names
    y = m.apply(v, jnp.ones((1, 8, 8, 3)))
    assert y.shape == (1, 8, 8, 8)


def test_preactivation_order(rng):
    """preactivation=True must run norm->act->op (negative inputs survive to
    the op through the norm, unlike post-activation relu-before-norm)."""
    pre = build("""
act_fn: relu
preactivation: true
architecture:
  - conv2d: { kernel_size: [1, 1], out_channels: 1, padding: 0, use_bias: false }
""", shape=(2, 2, 3))
    post = build("""
act_fn: relu
preactivation: false
architecture:
  - conv2d: { kernel_size: [1, 1], out_channels: 1, padding: 0, use_bias: false }
""", shape=(2, 2, 3))
    x = -jnp.ones((1, 2, 2, 3))
    v = pre.init(rng)
    y_pre = pre.apply(v, x)
    y_post = post.apply(v, x)
    # pre: relu(x)=0 -> conv(0)=0 exactly; post: conv(x) then relu >= 0
    assert float(jnp.abs(y_pre).max()) == 0.0
    assert float(y_post.min()) >= 0.0


def test_resnet_zoo_builder_matches_torchvision_params():
    """spec/zoo.resnet_spec emits canonical ResNets through the spec
    language (named nodes + new-branch projection shortcuts + residual
    links + activation nodes): parameter counts equal torchvision's
    published counts EXACTLY, modulo the documented inert stem rows from
    TPU channel padding (3->8 lanes: 5*49*64 zero-gradient weights)."""
    import jax
    import jax.numpy as jnp

    from deepcv_tpu.ops.nn import get_model_capacity
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import resnet_spec

    import numpy as np

    PAD = 5 * 49 * 64
    for depth, expect in [(18, 11_689_512), (50, 25_557_032)]:
        m = DeepcvModule((64, 64, 3), resnet_spec(depth, pool_kernel=2))
        # eval_shape: count params without computing a single init value
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect + PAD, depth
    # forward shape + train-mode batch stats on the small build
    m = DeepcvModule((64, 64, 3), resnet_spec(18, num_classes=10, pool_kernel=2))
    v = m.init(jax.random.PRNGKey(0))
    y, st = m.apply(v, jnp.ones((2, 64, 64, 3)), train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 10) and "batch_stats" in st
    # identity shortcuts where torchvision uses them (r18 stage 0 has no proj)
    names = [e[list(e)[0]][0] if isinstance(e[list(e)[0]], list) else None
             for e in resnet_spec(18)["architecture"] if isinstance(e, dict)]
    assert "s0b0_proj" not in names and "s1b0_proj" in names


@pytest.mark.slow
def test_mobilenet_v2_zoo_builder_matches_torchvision_params():
    """spec/zoo.mobilenet_v2_spec: the depthwise/inverted-residual family
    through the spec language (grouped convs with groups=channels, linear
    bottlenecks, identity residuals only at stride-1 equal-width blocks).
    Parameter count equals torchvision mobilenet_v2's published 3,504,872
    EXACTLY modulo the documented inert stem rows (3->8 lane padding:
    9*5*32 zero-gradient weights, ops/nn.py cin<8 rationale)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import mobilenet_v2_spec

    PAD = 9 * 5 * 32
    m = DeepcvModule((64, 64, 3), mobilenet_v2_spec(pool_kernel=2))
    vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(vs["params"]))
    assert n == 3_504_872 + PAD, n
    # depthwise kernels really are depthwise: (3,3,1,c) shapes exist
    dw = vs["params"]["node_impls_ir1b0_dw"]["op"]["kernel"]
    assert dw.shape == (3, 3, 1, 96), dw.shape
    # batch_stats cover every BN channel twice (mean+var)
    n_bs = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(vs["batch_stats"]))
    assert n_bs == 2 * 17_056, n_bs
    # small build: forward shape, train-mode stats, residual graph intact
    m = DeepcvModule((32, 32, 3), mobilenet_v2_spec(num_classes=10,
                                                    pool_kernel=1))
    v = m.init(jax.random.PRNGKey(0))
    y, st = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 10) and "batch_stats" in st
    arch = mobilenet_v2_spec()["architecture"]
    names = [e[list(e)[0]][0] if isinstance(e[list(e)[0]], list) else None
             for e in arch if isinstance(e, dict)]
    # t=1 first block has no expand conv; stride-2 blocks have no residual
    assert "ir0b0_exp" not in names and "ir1b0_exp" in names
    assert "ir1b0_sum" not in names and "ir1b1_sum" in names


@pytest.mark.slow
def test_efficientnet_b0_zoo_builder_matches_torchvision_params():
    """spec/zoo.efficientnet_b0_spec: MBConv (inverted residual + SE between
    depthwise and projection, SE hidden = block input // 4, silu) through
    the spec language — parameter count equals torchvision
    efficientnet_b0's 5,288,548 EXACTLY modulo the documented inert stem
    rows (9*5*32 lane padding)."""
    import jax
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import efficientnet_b0_spec

    PAD = 9 * 5 * 32
    m = DeepcvModule((64, 64, 3), efficientnet_b0_spec(pool_kernel=2))
    vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(vs["params"]))
    assert n == 5_288_548 + PAD, n
    # SE widths follow the block INPUT (c_in // 4), not the expanded width:
    # stage-1 block 0 has c_in=16, c_exp=96 -> reduce kernel (96, 4)
    se = vs["params"]["node_impls_mb1b0_se"]
    assert se["reduce"]["kernel"].shape == (96, 4), se["reduce"]["kernel"].shape
    assert se["expand"]["kernel"].shape == (4, 96)
    # 5x5 depthwise stages exist (kernel per-stage, unlike MobileNetV2)
    dw5 = vs["params"]["node_impls_mb2b0_dw"]["op"]["kernel"]
    assert dw5.shape == (5, 5, 1, 144), dw5.shape
    # small build forwards with train-mode stats
    m = DeepcvModule((32, 32, 3), efficientnet_b0_spec(num_classes=10,
                                                       pool_kernel=1))
    v = m.init(jax.random.PRNGKey(0))
    y, st = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 10) and "batch_stats" in st


@pytest.mark.slow
def test_mobilenet_v3_zoo_builder_matches_torchvision_params():
    """spec/zoo.mobilenet_v3_spec: over V2's inverted residual adds
    hard_swish stages, per-row 3x3/5x5 depthwise kernels, MobileNetV3's SE
    flavor (squeeze width = _make_divisible(c_exp // 4, 8), relu inside,
    HARD-sigmoid gate) and the norm-free classifier pair. Parameter counts
    equal torchvision's mobilenet_v3_large 5,483,032 / small 2,542,856
    EXACTLY modulo the documented inert stem rows (3->8 lane padding:
    9*5*16 zero-gradient weights — the MNV3 stem is 16ch, not 32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import mobilenet_v3_spec

    PAD = 9 * 5 * 16
    counts = {}
    for variant, expect in (("large", 5_483_032), ("small", 2_542_856)):
        m = DeepcvModule((64, 64, 3), mobilenet_v3_spec(variant=variant,
                                                        pool_kernel=2))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect + PAD, (variant, n)
        counts[variant] = vs

    vs = counts["large"]
    # MNV3 SE width is divisor-8-rounded from the EXPANDED channels:
    # large block ir3 has c_exp=72 -> squeeze 72//4=18 -> rounded 24
    se = vs["params"]["node_impls_ir3_se"]
    assert se["reduce"]["kernel"].shape == (72, 24), se["reduce"]["kernel"].shape
    assert se["expand"]["kernel"].shape == (24, 72)
    # early 'RE' rows have no SE; 5x5 depthwise rows exist
    assert "node_impls_ir1_se" not in vs["params"]
    assert vs["params"]["node_impls_ir3_dw"]["op"]["kernel"].shape == (5, 5, 1, 72)
    # classifier pair is norm-free: FC 960 -> 1280 -> classes, no norms scope
    pre = vs["params"]["node_impls_pre_classifier"]
    assert pre["op"]["kernel"].shape == (960, 1280)
    assert "norms_0" not in pre
    # first row (exp 16 == in 16) emits no expand conv
    assert "node_impls_ir0_exp" not in vs["params"]

    # small build forwards with train-mode stats (small variant: SE on row 0)
    m = DeepcvModule((32, 32, 3), mobilenet_v3_spec(variant="small",
                                                    num_classes=10,
                                                    pool_kernel=1))
    v = m.init(jax.random.PRNGKey(0))
    y, st = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 10) and "batch_stats" in st


def test_vit_zoo_builder_matches_torchvision_params():
    """spec/zoo.vit_spec: all four torchvision variants land EXACTLY on the
    published parameter counts at 224x224 — with NO inert pad rows, because
    the patch embedding is a reshape + Dense (ops/attention.py:PatchEmbed)
    rather than a lane-padded stride-p conv. Also: the final-LN 'norm' node
    and take_token creators appear, and a 2-block shrink forwards in both
    modes with dropout rngs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import vit_spec

    for variant, expect in (("b_16", 86_567_656), ("b_32", 88_224_232),
                            ("l_16", 304_326_632), ("l_32", 306_535_400),
                            ("h_14", 632_045_800)):
        m = DeepcvModule((224, 224, 3), vit_spec(variant=variant))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect, (variant, n, expect)

    with pytest.raises(ValueError, match="variant must be one of"):
        vit_spec(variant="g_14")

    hp = vit_spec(variant="b_16", num_classes=7, dropout=0.1)
    hp["architecture"] = hp["architecture"][:3] + hp["architecture"][-3:]
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    assert "pos_embedding" in v["params"]["node_impls_embed"]
    assert "norms_0" in v["params"]["node_impls_final_ln"]
    y = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 7) and bool(jnp.isfinite(y).all())
    # patch size must divide the input
    bad = vit_spec(variant="b_16")
    with pytest.raises(ValueError, match="not divisible"):
        DeepcvModule((30, 30, 3), bad).init(jax.random.PRNGKey(0))


def test_convnext_zoo_builder_matches_torchvision_params():
    """spec/zoo.convnext_spec: all four torchvision variants land EXACTLY
    on the published counts at 224 (tiny 28,589,128 / small 50,223,688 /
    base 88,591,464 / large 197,767,336) — zero pad rows (patchify stem is
    reshape+Dense). Drop-path ramp is linear from 0; a tiny build forwards
    train-mode with dropout rngs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import convnext_spec

    for variant, expect in (("tiny", 28_589_128), ("small", 50_223_688),
                            ("base", 88_591_464), ("large", 197_767_336)):
        m = DeepcvModule((224, 224, 3), convnext_spec(variant=variant))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect, (variant, n, expect)

    with pytest.raises(ValueError, match="variant must be one of"):
        convnext_spec(variant="xl")

    hp = convnext_spec(variant="tiny", num_classes=7, pool_kernel=1,
                       stochastic_depth=0.1)
    rows = [r["convnext_block"][1]["drop_path_prob"]
            for r in hp["architecture"] if "convnext_block" in r]
    assert rows[0] == 0.0 and abs(rows[-1] - 0.1) < 1e-9 and len(rows) == 18
    # shrink to one block per stage for a fast executing forward
    hp["architecture"] = [r for r in hp["architecture"]
                          if "convnext_block" not in r
                          or r["convnext_block"][0] in ("s0b0", "s1b0",
                                                        "s2b0", "s3b0")]
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    assert "layer_scale" in v["params"]["node_impls_s0b0"]
    y = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 7) and bool(jnp.isfinite(y).all())


def test_swin_zoo_builder_matches_torchvision_params():
    """spec/zoo.swin_spec: all three torchvision variants EXACT at 224
    (t 28,288,354 / s 49,606,258 / b 87,768,224 — also hand-derived from
    the block arithmetic), zero pad rows; W-MSA/SW-MSA alternation and the
    drop-path ramp are emitted; full swin_t forwards at 64px window 2."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import swin_spec

    for variant, expect in (("t", 28_288_354), ("s", 49_606_258),
                            ("b", 87_768_224)):
        m = DeepcvModule((224, 224, 3), swin_spec(variant=variant))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect, (variant, n, expect)

    with pytest.raises(ValueError, match="variant must be one of"):
        swin_spec(variant="l")

    hp = swin_spec(variant="t", num_classes=7, window=2, pool_kernel=2)
    rows = [r["swin_block"][1] for r in hp["architecture"]
            if "swin_block" in r]
    assert [r["shift"] for r in rows[:4]] == [0, 1, 0, 1]   # W/SW alternate
    dps = [r["drop_path_prob"] for r in rows]
    assert dps[0] == 0.0 and abs(dps[-1] - 0.2) < 1e-9
    assert all(b >= a for a, b in zip(dps, dps[1:]))
    m = DeepcvModule((64, 64, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    assert "rel_pos_bias" in v["params"]["node_impls_s0b0"]["attn"]
    y = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 64, 64, 3)))
    assert y.shape == (2, 7) and bool(jnp.isfinite(y).all())


def test_densenet_zoo_builder_matches_torchvision_params():
    """spec/zoo.densenet_spec: dense connectivity through the spec
    language's ref machinery in TORCH channel order; counts equal
    torchvision exactly modulo the documented stem pad rows (121
    7,978,856 / 169 14,149,480 / 201 20,013,928)."""
    import jax
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import densenet_spec

    PAD = 7 * 7 * 5 * 64
    for depth, expect in ((121, 7_978_856), (169, 14_149_480),
                          (201, 20_013_928)):
        m = DeepcvModule((224, 224, 3), densenet_spec(depth=depth))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect + PAD, (depth, n, expect + PAD)
    with pytest.raises(ValueError, match="depth must be one of"):
        densenet_spec(depth=264)


def test_resnext_and_wide_resnet_variants():
    """resnet_spec(groups/width_per_group) lands on torchvision's ResNeXt-50
    32x4d (25,028,904) and Wide ResNet-50-2 (68,883,240) exactly (modulo
    stem pad); basic depths reject the kwargs; zoo dispatch passes them."""
    import jax
    import numpy as np

    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import resnet_spec

    PAD = 7 * 7 * 5 * 64
    for kw, expect in (({"groups": 32, "width_per_group": 4}, 25_028_904),
                       ({"width_per_group": 128}, 68_883_240)):
        m = DeepcvModule((224, 224, 3), resnet_spec(50, **kw))
        vs = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0)))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(vs["params"]))
        assert n == expect + PAD, (kw, n, expect + PAD)
    with pytest.raises(ValueError, match="bottleneck"):
        resnet_spec(18, groups=32, width_per_group=4)


# ------------------------------------------------------------ blur curriculum --

BLUR_YML = """
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - blur_curriculum: { kernel_size: 5, init_sigma: 2.0, decay_steps: 3, schedule: linear }
  - flatten: {}
  - fully_connected: { act_fn: null, out_features: 4 }
"""


def test_blur_curriculum_anneals_to_exact_identity():
    """Reference README.md:128 TODO: gaussian blur on conv activations with
    decreasing bandwidth over training. At sigma=2 the blur low-passes
    (noise variance drops); the step counter (a batch_stats scalar) advances
    per train-mode call; once past decay_steps the taps are an EXACT one-hot
    so the module output is bit-identical to its input."""
    import flax
    from deepcv_tpu.ops.nn import BlurCurriculum

    blur = BlurCurriculum(kernel_size=5, init_sigma=2.0, decay_steps=3,
                          schedule="linear")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    v = blur.init(jax.random.PRNGKey(1), x)
    y0 = blur.apply(v, x, train=False)
    assert float(jnp.var(y0)) < 0.5 * float(jnp.var(x))  # strong low-pass
    vars_ = v
    for i in range(4):  # advance past decay_steps
        _, st = blur.apply(vars_, x, train=True, mutable=["batch_stats"])
        vars_ = {**vars_, "batch_stats": st["batch_stats"]}
    flat = flax.traverse_util.flatten_dict(vars_["batch_stats"])
    assert [int(val) for val in flat.values()] == [4]
    y_done = blur.apply(vars_, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_done), np.asarray(x))


def test_blur_curriculum_spec_node_and_validation():
    m = DeepcvModule((8, 8, 3), load_yaml(BLUR_YML))
    v = m.init(jax.random.PRNGKey(0))
    y, st = m.apply(v, jnp.ones((2, 8, 8, 3)), train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == (2, 4) and "batch_stats" in st
    bad = load_yaml(BLUR_YML.replace("schedule: linear", "schedule: nope"))
    with pytest.raises(ValueError, match="cosine|linear|exponential"):
        DeepcvModule((8, 8, 3), bad)
    bad2 = load_yaml(BLUR_YML.replace("kernel_size: 5, init_sigma",
                                      "kernel_size: 4, init_sigma"))
    with pytest.raises(ValueError, match="odd"):
        DeepcvModule((8, 8, 3), bad2)
