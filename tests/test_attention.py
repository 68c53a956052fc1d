"""Attention ops: flash kernel correctness vs the XLA reference path.

The torch-mirror axis lives in test_torch_parity.py (ViT family); here we
pin the kernel itself: padding/masking at non-block-multiple T, bf16 io
with f32 accumulation, custom-VJP gradients, and jit composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.ops.attention import (MultiHeadSelfAttention, attention_xla,
                                      flash_attention,
                                      scaled_dot_product_attention)


def _qkv(t, dh=16, n=2, h=3, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (n, h, t, dh), dtype) for k in ks)


@pytest.mark.parametrize("t", [8, 128, 197, 300])
def test_flash_matches_xla_forward(t):
    """Online-softmax kernel == einsum+softmax at any static T, including
    the non-block-multiple sizes that exercise the -inf padding mask
    (197 is ViT-B/16 @224's token count)."""
    q, k, v = _qkv(t)
    a = attention_xla(q, k, v)
    f = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                               atol=2e-6, rtol=1e-5)


def test_flash_gradients_match_xla():
    """custom-VJP backward (XLA rematerialization) == autodiff through the
    reference path, all three operands."""
    q, k, v = _qkv(37)

    def lx(q, k, v):
        return jnp.sum(jnp.sin(attention_xla(q, k, v)))

    def lf(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v)))

    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gx, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_flash_bf16_io_f32_accumulation():
    """bf16 in/out stays close to the f32 reference — the accumulators are
    f32 inside the kernel, so the only loss is io rounding."""
    q, k, v = _qkv(64)
    ref = attention_xla(q, k, v)
    f = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16))
    assert f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(f, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_dispatch_and_errors():
    q, k, v = _qkv(8)
    np.testing.assert_allclose(
        np.asarray(scaled_dot_product_attention(q, k, v, impl="xla")),
        np.asarray(scaled_dot_product_attention(q, k, v, impl="flash")),
        atol=2e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="unknown attention impl"):
        scaled_dot_product_attention(q, k, v, impl="sdpa")


def test_mhsa_module_head_split_invariants():
    """Head count must divide the embed dim; per-head outputs are permutation
    -consistent (swapping two input tokens swaps the two output tokens)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    m = MultiHeadSelfAttention(num_heads=4)
    with pytest.raises(ValueError, match="not divisible"):
        MultiHeadSelfAttention(num_heads=5).init(jax.random.PRNGKey(0), x)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    perm = jnp.array([1, 0, 2, 3, 4, 5])
    y_perm = m.apply(v, x[:, perm])
    np.testing.assert_allclose(np.asarray(y[:, perm]), np.asarray(y_perm),
                               atol=1e-5, rtol=1e-5)


def _tiny_vit_hp(num_classes=5, attn_impl="xla"):
    from deepcv_tpu.spec.zoo import vit_spec
    hp = vit_spec(variant="b_16", num_classes=num_classes,
                  attn_impl=attn_impl)
    arch = hp["architecture"][:3] + hp["architecture"][-3:]
    arch[0]["patch_embed"][1].update(patch_size=8, embed_dim=32)
    for row in arch[1:3]:
        row["transformer_block"][1].update(num_heads=4, mlp_dim=64)
    hp["architecture"] = arch
    return hp


def test_vit_tensor_parallel_training_exactness(tmp_path):
    """Transformer blocks under dp x tp GSPMD: kernel out-features sharded
    over the 'model' axis (qkv/out/mlp Denses included) must leave the
    training math unchanged vs the single-device run — sharding is layout,
    not math, even through the attention head split/merge reshapes."""
    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train import train
    from deepcv_tpu.train.backend import BackendConfig

    raw = load_dataset("synthetic", n=256, image_shape=(16, 16, 3),
                       num_classes=5, seed=3)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}

    def run(backend):
        model = DeepcvModule((16, 16, 3), _tiny_vit_hp())
        state, hist = train(dict(hp), model, "cross_entropy", data,
                            backend_conf=backend)
        return state, hist

    be = BackendConfig(tensor_parallel=2)
    assert dict(be.mesh.shape) == {"data": 4, "model": 2}
    state_tp, hist_tp = run(be)
    # qkv kernel (32, 96) is model-sharded on out-features
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: str(getattr(l, "sharding", "")), state_tp.params)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]}
    assert any("model" in v for k, v in flat.items() if "qkv" in k), flat
    _, hist_dp = run(BackendConfig(n_devices=1))
    np.testing.assert_allclose(hist_tp["train"][-1]["main_loss"],
                               hist_dp["train"][-1]["main_loss"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t", [37, 197])
def test_flash_pallas_backward_matches_xla(t):
    """The full Pallas backward (dq/dkv kernels rebuilding softmax tiles
    from the saved logsumexp) == autodiff through the reference path at
    non-block-multiple T — the padded-row/col masks in BOTH kernels."""
    q, k, v = _qkv(t)

    gx = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(attention_xla(q, k, v))),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(flash_attention(q, k, v))),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gx, gf):
        assert bool(jnp.isfinite(b).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_flash_backward_asymmetric_blocks():
    """dq iterates k-blocks and dkv iterates q-blocks: exercise them with
    block_q != block_k (which also forces a fully-padded trailing block on
    one of the two grids) via the impl entry points."""
    from deepcv_tpu.ops.attention import _flash_bwd_impl, _flash_fwd_impl
    q, k, v = _qkv(100)
    o, lse = _flash_fwd_impl(q, k, v, return_lse=True)
    g = jax.random.normal(jax.random.PRNGKey(9), o.shape, o.dtype)
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, lse, g,
                                 block_q=256, block_k=128)
    # reference: autodiff through the XLA path with the same cotangent
    _, vjp = jax.vjp(attention_xla, q, k, v)
    rq, rk, rv = vjp(g)
    for a, b in zip((rq, rk, rv), (dq, dk, dv)):
        assert bool(jnp.isfinite(b).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_flash_bf16_gradients_finite_and_close():
    """bf16 io through the Pallas backward: f32 tile math inside, so the
    grads stay within bf16 io rounding of the f32 reference."""
    q, k, v = _qkv(64)
    gx = jax.grad(lambda *a: jnp.sum(attention_xla(*a).astype(jnp.float32)
                                     ** 2), argnums=(0, 1, 2))(q, k, v)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    gf = jax.jit(jax.grad(
        lambda *a: jnp.sum(flash_attention(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))(qb, kb, vb)
    for a, b in zip(gx, gf):
        assert b.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(b.astype(jnp.float32)).all())
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a), atol=0.1, rtol=0.1)


def test_flash_block_q_gt_block_k_no_nan():
    """A fully-padded k-block (block_q > block_k forces padding past a
    k-block boundary) must not poison the output with NaN — the mask is a
    large finite negative, not -inf."""
    from deepcv_tpu.ops.attention import _flash_fwd_impl
    q, k, v = _qkv(100)
    out = _flash_fwd_impl(q, k, v, block_q=256, block_k=128)
    ref = attention_xla(q, k, v)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_attention_probability_dropout_torch_semantics():
    """dropout_prob drops ATTENTION PROBABILITIES (torch MultiheadAttention
    semantics): train draws differ by rng, eval is deterministic and equals
    the no-dropout module exactly; flash + dropout raises."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    m = MultiHeadSelfAttention(num_heads=4, dropout_prob=0.5)
    v = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-3
    m0 = MultiHeadSelfAttention(num_heads=4, dropout_prob=0.0)
    np.testing.assert_allclose(np.asarray(m.apply(v, x, train=False)),
                               np.asarray(m0.apply(v, x)), atol=1e-6)
    mf = MultiHeadSelfAttention(num_heads=4, dropout_prob=0.5,
                                attn_impl="flash")
    with pytest.raises(ValueError, match="flash"):
        mf.init(jax.random.PRNGKey(0), x)


def test_resize_pos_embedding_resolution_transfer(tmp_path):
    """A ViT trained at one resolution transfers to another: the position
    table's grid part is bicubic-resampled (torchvision
    interpolate_embeddings semantics, [cls] slot untouched) and the new
    model forwards; at the SAME resolution the resample is an exact no-op.
    The resized model also round-trips through the StableHLO deployment
    artifact (serving story for the attention family)."""
    from deepcv_tpu.ops.attention import resize_pos_embedding
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.serve import export_stablehlo, load_stablehlo

    hp = _tiny_vit_hp()
    m16 = DeepcvModule((16, 16, 3), hp)
    v16 = m16.init(jax.random.PRNGKey(0))
    pos = v16["params"]["node_impls_embed"]["pos_embedding"]
    assert pos.shape == (1, 5, 32)            # [cls] + 2x2 grid

    # identity at the same resolution
    same = resize_pos_embedding(v16, new_hw=16, patch_size=8)
    np.testing.assert_allclose(
        np.asarray(same["params"]["node_impls_embed"]["pos_embedding"]),
        np.asarray(pos), atol=1e-6)

    # transfer 16 -> 32 (2x2 -> 4x4 grid); all other params shared
    v32 = resize_pos_embedding(v16, new_hw=32, patch_size=8)
    new_pos = v32["params"]["node_impls_embed"]["pos_embedding"]
    assert new_pos.shape == (1, 17, 32)
    np.testing.assert_allclose(np.asarray(new_pos[:, 0]),
                               np.asarray(pos[:, 0]), atol=1e-6)  # cls kept
    m32 = DeepcvModule((32, 32, 3), hp)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = jax.jit(lambda v, x: m32.apply(v, x, train=False))(v32, x)
    assert y.shape == (2, 5) and bool(jnp.isfinite(y).all())

    # deployment artifact round-trip at the new resolution
    path = tmp_path / "vit32.stablehlo"
    export_stablehlo(path, m32, v32, batch_size=2)
    fn = load_stablehlo(path)
    np.testing.assert_allclose(np.asarray(fn(np.asarray(x, np.float32))),
                               np.asarray(y), atol=1e-5, rtol=1e-5)


def test_stochastic_depth_drop_path():
    """drop_path gates whole residual BRANCHES per sample: at rate->1-eps
    in train mode the block degenerates toward identity on dropped
    samples; eval is deterministic and identical to drop_path 0; vit_spec
    ramps the rate linearly across blocks (0 on the first block)."""
    from deepcv_tpu.ops.attention import TransformerEncoderBlock
    from deepcv_tpu.spec.zoo import vit_spec

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 16))
    blk = TransformerEncoderBlock(num_heads=4, mlp_dim=32,
                                  drop_path_prob=0.999)
    v = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    # with p ~ 1 virtually every branch is dropped -> output == input
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-2)
    blk0 = TransformerEncoderBlock(num_heads=4, mlp_dim=32)
    np.testing.assert_allclose(np.asarray(blk.apply(v, x, train=False)),
                               np.asarray(blk0.apply(v, x)), atol=1e-6)

    hp = vit_spec(variant="b_16", stochastic_depth=0.1)
    rows = [r["transformer_block"][1]["drop_path_prob"]
            for r in hp["architecture"] if "transformer_block" in r]
    assert rows[0] == 0.0 and abs(rows[-1] - 0.1) < 1e-9
    assert all(b >= a for a, b in zip(rows, rows[1:]))


def test_rms_norm_technique_and_transformer_block():
    """rms_norm (TPU-era addition beyond the reference's norm enum):
    technique-registry output matches an executing torch.nn.RMSNorm; in the
    transformer block it is scale-only (no bias) under the SAME path names
    (ln_1/ln_2) so calibration/sharding rules apply unchanged; gradients
    are finite; vit_spec threads it through every block AND the final norm
    node, and omits the key at the LayerNorm parity default."""
    import torch
    from deepcv_tpu.ops.attention import TransformerEncoderBlock
    from deepcv_tpu.ops.nn import normalization_techniques
    from deepcv_tpu.spec.zoo import vit_spec

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 16), jnp.float32)
    (mod,) = normalization_techniques({"rms_norm": {"eps": 1e-6}})
    v = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(v, x)
    with torch.no_grad():
        ty = torch.nn.RMSNorm(16, eps=1e-6)(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-5)

    blk = TransformerEncoderBlock(num_heads=4, mlp_dim=32, norm="rms_norm")
    vb = blk.init(jax.random.PRNGKey(2), x)
    assert set(vb["params"]["ln_1"]) == {"scale"}  # scale-only: no bias
    vl = TransformerEncoderBlock(num_heads=4, mlp_dim=32).init(
        jax.random.PRNGKey(2), x)
    assert set(vl["params"]["ln_1"]) == {"scale", "bias"}
    g = jax.grad(lambda p: jnp.sum(blk.apply({"params": p}, x)))(
        vb["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    with pytest.raises(ValueError, match="norm"):
        TransformerEncoderBlock(num_heads=4, mlp_dim=32,
                                norm="batchnorm").apply(vb, x)

    hp = vit_spec("b_16", norm="rms_norm")
    nodes = [r["transformer_block"][1] for r in hp["architecture"]
             if "transformer_block" in r]
    assert all(n["norm"] == "rms_norm" for n in nodes)
    (final,) = [r["norm"] for r in hp["architecture"] if "norm" in r]
    assert "rms_norm" in final[1]
    default_nodes = [r["transformer_block"][1] for r in
                     vit_spec("b_16")["architecture"]
                     if "transformer_block" in r]
    assert all("norm" not in n for n in default_nodes)

    # the same lever on the other LN-heavy families: Swin + ConvNeXt blocks
    from deepcv_tpu.ops.attention import SwinBlock
    from deepcv_tpu.ops.nn import ConvNeXtBlock
    from deepcv_tpu.spec.zoo import convnext_spec, swin_spec
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 16))
    vs = SwinBlock(num_heads=4, window=2, norm="rms_norm").init(
        jax.random.PRNGKey(4), xs)
    assert set(vs["params"]["ln_1"]) == {"scale"}
    vc = ConvNeXtBlock(norm="rms_norm").init(jax.random.PRNGKey(5), xs)
    assert set(vc["params"]["ln"]) == {"scale"}
    for spec, key in ((swin_spec("t", norm="rms_norm"), "swin_block"),
                      (convnext_spec("tiny", norm="rms_norm"),
                       "convnext_block")):
        blocks = [r[key][1] for r in spec["architecture"] if key in r]
        assert blocks and all(b["norm"] == "rms_norm" for b in blocks)


def test_fast_config_trains_comparably(tmp_path):
    """The ViT fast config (rms_norm + gelu_tanh) is a THROUGHPUT lever,
    not a different model family: on a seeded tiny transformer both
    configs' losses decrease and land close after the same number of
    steps — guarding against a silently-inert or destabilizing norm swap."""
    from deepcv_tpu.data.datasets import ArrayDataset
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train import BackendConfig, train

    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 16, 16, 3)).astype(np.float32)
    Y = (X.mean(axis=(1, 2, 3)) > 0).astype(np.int32)  # learnable signal

    def run(norm, mlp_act):
        arch = [{"patch_embed": ["embed", {"patch_size": 8,
                                           "embed_dim": 32}]}]
        for i in range(2):
            node = {"num_heads": 4, "mlp_dim": 64,
                    "norm": norm, "mlp_act": mlp_act}
            arch.append({"transformer_block": [f"enc{i}", node]})
        arch += [{"norm": ["final", {norm: {"eps": 1e-6}}]},
                 {"take_token": {"index": 0}},
                 {"fully_connected": {"out_features": 2, "act_fn": None}}]
        m = DeepcvModule((16, 16, 3), {"act_fn": "gelu",
                                       "architecture": arch})
        hp = {"epochs": 4, "batch_size": 16,
              "optimizer_opts": {"lr": 3e-3},
              "save_every_iters": 0, "log_progress_every_iters": 1,
              "validate_every_epochs": 100, "seed": 7,
              "output_path": str(tmp_path / f"{norm}_{mlp_act}")}
        _, hist = train(hp, m, "cross_entropy",
                        {"trainset": ArrayDataset(X, Y)},
                        backend_conf=BackendConfig(n_devices=1))
        losses = [float(r["main_loss"]) for r in hist["train"]]
        return losses[0], float(np.mean(losses[-4:]))

    first_ln, final_ln = run("layer_norm", "gelu")
    first_rms, final_rms = run("rms_norm", "gelu_tanh")
    assert final_ln < first_ln and final_rms < first_rms
    # both regimes LEARN the task (loss collapses from ~ln(2)) and land in
    # the same converged ballpark — near zero a relative gap is meaningless
    assert final_ln < 0.25 and final_rms < 0.25, (final_ln, final_rms)
    assert abs(final_rms - final_ln) < 0.15, (final_ln, final_rms)


def test_mlp_act_gelu_tanh_option():
    """mlp_act='gelu_tanh' (the measured-faster approximate GELU) swaps the
    MLP activation: same params/shapes, slightly different values (the
    erf-vs-tanh gap), bad names rejected; vit_spec threads it through and
    omits the key at the parity default."""
    import pytest
    from deepcv_tpu.ops.attention import TransformerEncoderBlock
    from deepcv_tpu.spec.zoo import vit_spec

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    exact = TransformerEncoderBlock(num_heads=4, mlp_dim=32)
    tanh = TransformerEncoderBlock(num_heads=4, mlp_dim=32,
                                   mlp_act="gelu_tanh")
    v = exact.init(jax.random.PRNGKey(1), x)
    y0, y1 = exact.apply(v, x), tanh.apply(v, x)
    assert y0.shape == y1.shape
    d = float(jnp.abs(y0 - y1).max())
    assert 0.0 < d < 1e-2  # erf-vs-tanh gap: tiny but nonzero
    with pytest.raises(ValueError, match="mlp_act"):
        TransformerEncoderBlock(num_heads=4, mlp_dim=32,
                                mlp_act="swish").apply(v, x)
    hp = vit_spec("b_16", mlp_act="gelu_tanh")
    nodes = [r["transformer_block"][1] for r in hp["architecture"]
             if "transformer_block" in r]
    assert all(n["mlp_act"] == "gelu_tanh" for n in nodes)
    assert all("mlp_act" not in n for n in
               (r["transformer_block"][1] for r in
                vit_spec("b_16")["architecture"]
                if "transformer_block" in r))


def test_drop_path_model_requires_fresh_rng():
    """A model whose ONLY stochastic piece is drop_path must hit the same
    rng guard as dropout — a silent constant key would drop the same
    branches every step (fixed structural mask)."""
    from deepcv_tpu.spec import DeepcvModule

    hp = _tiny_vit_hp()
    for row in hp["architecture"]:
        if "transformer_block" in row:
            row["transformer_block"][1]["drop_path_prob"] = 0.2
    m = DeepcvModule((16, 16, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 16, 16, 3))
    with pytest.raises(ValueError, match="requires rngs"):
        m.apply(v, x, train=True)
    y = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert y[0].shape == (2, 5) if isinstance(y, tuple) else y.shape == (2, 5)


def test_vit_int8_serving_and_qat_builds():
    """quantize='int8' reaches the transformer projections (qkv/out/mlp +
    patch embed): calibrated static scales -> int8 rebuild restores the
    FLOAT param tree unchanged and agrees on top-1; the 'int8_qat' build
    trains (STE keeps gradients alive through the fake-quant)."""
    from deepcv_tpu.compression import calibrate_int8_scales
    from deepcv_tpu.spec import DeepcvModule

    hp = _tiny_vit_hp()
    m = DeepcvModule((16, 16, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    ref = m.apply(v, x, train=False)

    scales = calibrate_int8_scales(m, v, [x[:8], x[8:]])
    assert any(k.startswith("enc") for k in scales) and "embed" in scales
    # per-sublayer keys are recorded and strictly refine the node max
    assert "enc0/attn/qkv" in scales and "enc0/mlp/fc1" in scales
    assert scales["enc0/attn/qkv"] <= scales["enc0"] + 1e-12
    assert "embed/proj" in scales
    mq = DeepcvModule((16, 16, 3), hp, quantize="int8",
                      quantize_scales=scales)
    yq = jax.jit(lambda v, x: mq.apply(v, x, train=False))(v, x)
    assert yq.shape == ref.shape and bool(jnp.isfinite(yq).all())
    agree = float(jnp.mean((jnp.argmax(yq, -1) == jnp.argmax(ref, -1))))
    assert agree >= 0.75, agree   # random-init logits are near-ties; top-1
                                  # agreement just needs to be far from chance

    mqat = DeepcvModule((16, 16, 3), hp, quantize="int8_qat")
    g = jax.grad(lambda p: jnp.sum(
        mqat.apply({"params": p}, x, train=False) ** 2))(v["params"])
    qkv_g = g["node_impls_enc0"]["attn"]["qkv"]["kernel"]
    assert float(jnp.max(jnp.abs(qkv_g))) > 0.0   # STE gradients alive


# --------------------------------------------------------------------------- #
# Swin windowed attention
# --------------------------------------------------------------------------- #

def test_window_attention_full_window_equals_plain_attention():
    """With window == the whole map, no shift, and a zeroed bias table,
    WindowAttention is EXACTLY plain attention on the flattened tokens
    (same packed qkv/out weights through the verified attention_xla path)."""
    from deepcv_tpu.ops.attention import WindowAttention

    n, h, w, c, heads = 2, 4, 4, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    wa = WindowAttention(num_heads=heads, window=4)
    v = wa.init(jax.random.PRNGKey(1), x)
    v["params"]["rel_pos_bias"] = jnp.zeros_like(v["params"]["rel_pos_bias"])
    y = wa.apply(v, x)
    tok = x.reshape(n, h * w, c)
    qkv = tok @ v["params"]["qkv"]["kernel"] + v["params"]["qkv"]["bias"]
    q, k, vv = jnp.split(qkv, 3, axis=-1)
    hs = lambda z: z.reshape(n, h * w, heads, c // heads).transpose(0, 2, 1, 3)
    o = attention_xla(hs(q), hs(k), hs(vv))
    o = o.transpose(0, 2, 1, 3).reshape(n, h * w, c) \
        @ v["params"]["out"]["kernel"] + v["params"]["out"]["bias"]
    np.testing.assert_allclose(np.asarray(y.reshape(n, h * w, c)),
                               np.asarray(o), atol=1e-5, rtol=1e-5)


def test_window_attention_locality_and_shift_mask():
    """No shift: distant windows are INDEPENDENT (modifying one window
    cannot change another's output). Shifted: the wrap seam is masked —
    the static mask leaves the interior window fully unmasked and masks
    only cross-region pairs in seam windows; a constant map is invariant
    to shifting (cyclic roll of a constant is itself)."""
    from deepcv_tpu.ops.attention import (WindowAttention,
                                          _shift_attention_mask)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    wa = WindowAttention(num_heads=2, window=2)
    v = wa.init(jax.random.PRNGKey(1), x)
    y1 = wa.apply(v, x)
    y2 = wa.apply(v, x.at[:, :2, :2, :].set(0.0))
    np.testing.assert_array_equal(np.asarray(y1[:, 2:, 2:]),
                                  np.asarray(y2[:, 2:, 2:]))

    m = _shift_attention_mask(8, 8, 2, 1)        # (16, 4, 4)
    assert m.shape == (16, 4, 4)
    assert np.all(m[0] == 0.0)                   # interior: unmasked
    assert (m < 0).any()                         # seam windows: masked pairs
    np.testing.assert_array_equal(m, m.transpose(0, 2, 1))  # symmetric

    was = WindowAttention(num_heads=2, window=2, shift=1)
    vs = was.init(jax.random.PRNGKey(2), x)
    const = jnp.ones((1, 8, 8, 8)) * 0.3
    y_s = was.apply(vs, const)
    # constant input: every token sees identical content; output constant
    assert float(jnp.std(y_s.reshape(-1, 8), axis=0).max()) < 1e-5


def test_swin_block_and_patch_merging_shapes():
    from deepcv_tpu.ops.attention import (PatchMerging, SwinBlock,
                                          WindowAttention)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    blk = SwinBlock(num_heads=4, window=2, shift=1, drop_path_prob=0.1)
    v = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    pm = PatchMerging()
    vp = pm.init(jax.random.PRNGKey(3), x)
    assert pm.apply(vp, x).shape == (2, 4, 4, 32)
    assert "bias" not in vp["params"]["reduce"]   # torch: bias-free reduce
    with pytest.raises(ValueError, match="not divisible"):
        WindowAttention(num_heads=2, window=3).init(jax.random.PRNGKey(0), x)


@pytest.mark.slow
def test_swin_int8_serving_reaches_projections():
    """quantize='int8' must reach Swin's qkv/out/mlp/reduce projections
    (they are ~all the FLOPs) — calibrated rebuild restores the float tree
    and stays close on top-1."""
    from deepcv_tpu.compression import calibrate_int8_scales
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import swin_spec

    hp = swin_spec(variant="t", num_classes=5, window=2, pool_kernel=1)
    keep = {"s0b0", "s1b0", "s2b0", "s3b0"}
    hp["architecture"] = [r for r in hp["architecture"]
                          if "swin_block" not in r
                          or r["swin_block"][0] in keep]
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    ref = m.apply(v, x, train=False)
    scales = calibrate_int8_scales(m, v, [x])
    assert "s0b0/attn/qkv" in scales and "merge1/reduce" in scales
    mq = DeepcvModule((32, 32, 3), hp, quantize="int8",
                      quantize_scales=scales)
    yq = jax.jit(lambda v, x: mq.apply(v, x, train=False))(v, x)
    assert bool(jnp.isfinite(yq).all())
    # the quantized graph must actually differ from float (projections
    # really rerouted) yet agree on most top-1 decisions
    assert float(jnp.max(jnp.abs(yq - ref))) > 1e-7
    agree = float(jnp.mean((jnp.argmax(yq, -1) == jnp.argmax(ref, -1))))
    assert agree >= 0.75, agree


def test_swin_tensor_parallel_training_exactness(tmp_path):
    """Swin blocks under dp x tp GSPMD: windowed-attention reshapes and
    the relative-bias add are layout-safe — the TP training trajectory
    matches the single-device run exactly."""
    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import swin_spec
    from deepcv_tpu.train import train
    from deepcv_tpu.train.backend import BackendConfig

    hp_m = swin_spec(variant="t", num_classes=5, window=2, pool_kernel=2)
    # two stages (one W-MSA + the merge + one SW-MSA) keep the compile small
    keep = {"s0b0", "s1b1"}
    hp_m["architecture"] = [
        r for r in hp_m["architecture"]
        if ("swin_block" not in r or r["swin_block"][0] in keep)
        and ("patch_merging" not in r or r["patch_merging"][0] == "merge1")]
    raw = load_dataset("synthetic", n=128, image_shape=(16, 16, 3),
                       num_classes=5, seed=4)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    hp = {"epochs": 1, "batch_size": 32, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}

    def run(backend):
        model = DeepcvModule((16, 16, 3), hp_m)
        return train(dict(hp), model, "cross_entropy", data,
                     backend_conf=backend)

    _, hist_tp = run(BackendConfig(tensor_parallel=2))
    _, hist_dp = run(BackendConfig(n_devices=1))
    np.testing.assert_allclose(hist_tp["train"][-1]["main_loss"],
                               hist_dp["train"][-1]["main_loss"],
                               rtol=1e-4, atol=1e-5)
