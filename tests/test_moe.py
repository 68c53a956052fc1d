"""MoE (ops/moe.py): routing exactness, capacity, aux loss, EP sharding,
V-MoE through the spec language, and train() integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.ops.moe import (MoEMlp, expert_parallel_rules,
                                MOE_LOSSES_COLLECTION)
from deepcv_tpu.parallel import make_mesh


def _tokens(s=32, d=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (2, s, d), jnp.float32)


def test_moe_uniform_experts_equal_dense_mlp():
    """With every expert given IDENTICAL weights and capacity for all
    tokens, the mixture must equal gate_prob * the single dense MLP — the
    routing machinery exactly dispatches and combines every token."""
    x = _tokens()
    moe = MoEMlp(num_experts=4, mlp_dim=32, k=1, capacity_factor=4.0)
    v = moe.init(jax.random.PRNGKey(1), x)
    p = v["params"]
    # clone expert 0 into every expert
    for w in ("expert_w1", "expert_b1", "expert_w2", "expert_b2"):
        p[w] = jnp.broadcast_to(p[w][:1], p[w].shape)
    y = moe.apply({"params": p}, x)

    from deepcv_tpu.ops.attention import gelu_exact
    dense = (gelu_exact(x @ p["expert_w1"][0] + p["expert_b1"][0])
             @ p["expert_w2"][0] + p["expert_b2"][0])
    xs = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    probs = jax.nn.softmax(xs @ p["router"], axis=-1)
    gate = jnp.max(probs, axis=-1).reshape(x.shape[0], x.shape[1], 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense * gate),
                               rtol=1e-5, atol=1e-5)


def test_moe_top2_combines_two_experts():
    """k=2: output equals p1*E(x) + p2*E(x) under identical experts."""
    x = _tokens(s=16)
    moe = MoEMlp(num_experts=4, mlp_dim=32, k=2, capacity_factor=4.0)
    v = moe.init(jax.random.PRNGKey(1), x)
    p = v["params"]
    for w in ("expert_w1", "expert_b1", "expert_w2", "expert_b2"):
        p[w] = jnp.broadcast_to(p[w][:1], p[w].shape)
    y = moe.apply({"params": p}, x)
    from deepcv_tpu.ops.attention import gelu_exact
    dense = (gelu_exact(x @ p["expert_w1"][0] + p["expert_b1"][0])
             @ p["expert_w2"][0] + p["expert_b2"][0])
    xs = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    probs = jax.nn.softmax(xs @ p["router"], axis=-1)
    top2 = jnp.sort(probs, axis=-1)[:, -2:].sum(-1)
    gate = top2.reshape(x.shape[0], x.shape[1], 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense * gate),
                               rtol=1e-5, atol=1e-5)


def test_moe_capacity_drops_overflow_tokens():
    """capacity_factor so small every expert holds ONE token: exactly
    E tokens get a non-zero output, the rest fall through as zeros."""
    x = _tokens(s=32, d=8)
    e = 4
    moe = MoEMlp(num_experts=e, mlp_dim=8, k=1, capacity_factor=1e-6)
    v = moe.init(jax.random.PRNGKey(1), x)
    y = moe.apply(v, x)
    nonzero_tokens = int(jnp.sum(jnp.any(y != 0.0, axis=-1)))
    assert nonzero_tokens <= e  # capacity 1 slot per expert
    assert nonzero_tokens >= 1


def test_moe_aux_loss_sown_and_near_one_at_balance():
    """The Switch load-balance aux is E * sum(f_e * P_e): ~1.0 for a
    near-uniform router (random init over random tokens), and it must be
    retrievable through apply(mutable=...)."""
    x = _tokens(s=256, d=16, seed=3)
    moe = MoEMlp(num_experts=4, mlp_dim=16)
    v = moe.init(jax.random.PRNGKey(1), x)
    y, state = moe.apply(v, x, mutable=[MOE_LOSSES_COLLECTION])
    (aux,) = jax.tree_util.tree_leaves(state[MOE_LOSSES_COLLECTION])
    assert 0.9 < float(aux) < 2.0  # >= 1 in expectation, 1 at perfect balance
    assert jnp.isfinite(y).all()


def test_moe_grouped_routing_matches_global_when_capacity_ample():
    """group_size splits the batch into fixed-size routing groups (the
    V-MoE formulation — keeps dispatch memory linear in tokens). Routing
    decisions are per-token, so with ample capacity (no drops) the grouped
    output must be bit-comparable to the global-group exact path."""
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16), jnp.float32)
    kw = dict(num_experts=4, mlp_dim=32, k=2, capacity_factor=8.0)
    v = MoEMlp(**kw).init(jax.random.PRNGKey(1), x)
    y_global = MoEMlp(**kw).apply(v, x)
    # group_size=32 tokens -> 2 images per group -> 4 groups of 32
    y_grouped = MoEMlp(**kw, group_size=32).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_grouped), np.asarray(y_global),
                               rtol=1e-5, atol=1e-6)
    # and a group size that doesn't divide the batch falls back to the
    # largest static divisor (gcd) instead of a dynamic shape
    y_odd = MoEMlp(**kw, group_size=3 * 16).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_odd), np.asarray(y_global),
                               rtol=1e-5, atol=1e-6)


def test_moe_gradients_reach_router_and_experts():
    x = _tokens(s=16)
    moe = MoEMlp(num_experts=4, mlp_dim=16, k=2)
    v = moe.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(moe.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["router"]).sum()) > 0.0   # gates multiply outputs
    assert float(jnp.abs(g["expert_w1"]).sum()) > 0.0


def test_moe_expert_parallel_sharding_matches_unsharded(devices):
    """EP through GSPMD: expert dim sharded over 8 devices must give the
    same output as the unsharded apply — XLA inserts the token exchange."""
    mesh = make_mesh({"model": 8})
    x = _tokens(s=64, d=16)
    moe = MoEMlp(num_experts=8, mlp_dim=32, k=1)
    v = moe.init(jax.random.PRNGKey(1), x)
    ref = moe.apply(v, x)
    sharded = jax.device_put(v["params"],
                             expert_parallel_rules(v["params"], mesh))
    out = jax.jit(lambda p, x: moe.apply({"params": p}, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="divisible"):
        bad = MoEMlp(num_experts=6, mlp_dim=8)
        vb = bad.init(jax.random.PRNGKey(0), x)
        expert_parallel_rules(vb["params"], mesh)


def test_vmoe_spec_builds_and_trains(tmp_path):
    """vit_spec(moe_experts=...) -> V-MoE: builds through the spec engine,
    the MoE blocks land where requested, and train() consumes the sown
    load-balance aux (moe_aux term in the metrics, finite loss)."""
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import vit_spec
    from deepcv_tpu.train.training import train
    from deepcv_tpu.train.losses import cross_entropy_loss
    from deepcv_tpu.train.backend import BackendConfig
    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess

    hp = vit_spec("b_16", num_classes=4, moe_experts=4, moe_every=2)
    arch = list(hp["architecture"])
    blocks = [n for n in arch if "transformer_block" in n]
    # placement: every 2nd block counted from the back -> 6 of 12
    assert sum("moe" in b["transformer_block"][1] for b in blocks) == 6
    assert "moe" in blocks[-1]["transformer_block"][1]
    # shrink to test size: patch stem + last two blocks (one MoE, one dense)
    hp["architecture"] = arch[:1] + blocks[-2:] + arch[-3:]
    for b in hp["architecture"][1:3]:
        b["transformer_block"][1].update(num_heads=2, mlp_dim=16)
    hp["architecture"][0]["patch_embed"][1].update(patch_size=8, embed_dim=16)

    m = DeepcvModule((16, 16, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    assert MOE_LOSSES_COLLECTION in v  # the model sows
    x = jnp.ones((2, 16, 16, 3))
    y, state = m.apply(v, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 4) and MOE_LOSSES_COLLECTION in state

    raw = load_dataset("synthetic", n=64, image_shape=(16, 16, 3),
                       num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]},
                      cache_dir=str(tmp_path / "stats"))
    _, hist = train(
        {"epochs": 2, "batch_size": 16, "optimizer_opts": {"lr": 1e-3},
         "moe_aux_weight": 0.02, "output_path": str(tmp_path),
         "save_every_iters": 0, "log_progress_every_iters": 1, "seed": 7},
        m, cross_entropy_loss, data, backend_conf=BackendConfig())
    last = hist["train"][-1]
    assert np.isfinite(last["main_loss"])
    assert "moe_aux" in last and float(last["moe_aux"]) > 0.5

    # warm start from params-only variables (the usual fine-tune shape —
    # no moe_losses collection): the aux loss must still engage
    _, hist_ws = train(
        {"epochs": 1, "batch_size": 16, "optimizer_opts": {"lr": 1e-3},
         "moe_aux_weight": 0.02, "output_path": str(tmp_path / "ws"),
         "save_every_iters": 0, "log_progress_every_iters": 1, "seed": 8},
        m, cross_entropy_loss, data, backend_conf=BackendConfig(),
        init_variables={"params": v["params"]})
    assert "moe_aux" in hist_ws["train"][-1]
    assert float(hist_ws["train"][-1]["moe_aux"]) > 0.5


def test_moe_mlp_act_lever_reaches_experts():
    """mlp_act='gelu_tanh' must change the expert compute (it silently
    didn't, pre-fix) — same params, different activation, different out."""
    from deepcv_tpu.ops.moe import MoEMlp

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 12)) * 3.0
    a = MoEMlp(num_experts=2, mlp_dim=16, mlp_act="gelu")
    b = MoEMlp(num_experts=2, mlp_dim=16, mlp_act="gelu_tanh")
    v = a.init(jax.random.PRNGKey(1), x)
    ya = a.apply(v, x)
    yb = b.apply(v, x)
    assert not np.allclose(np.asarray(ya), np.asarray(yb))
    # and the tanh form stays close to exact erf (it is an approximation)
    assert float(jnp.abs(ya - yb).max()) < 0.1
