"""Seeded fuzz of the spec-language engine (spec/graph.py + creators).

The reference validates architectures only by construction-time dummy
forwards (SURVEY §4 "shape-checking as implicit testing"); this fuzzer goes
further: randomly composed VALID architectures (convs, poolings,
residual/dense links with spatial rescaling, varied normalization) must

  * build (single-trace compile, no n^2 forwards),
  * report `eval_shape` output shapes that EXACTLY match execution,
  * produce finite outputs and finite gradients end to end,
  * re-init deterministically (same spec + seed -> bit-identical params).

Any spec this generator emits is legal by construction, so every failure is
an engine bug, not a fixture bug.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcv_tpu.spec import DeepcvModule

HW = 16  # input spatial size; pools are capped so spatial never hits zero


def _random_hp(rng: np.random.Generator, n_nodes: int):
    arch = []
    named = []            # (name, out_channels) of ref-eligible nodes
    cur_ch = None
    pools = 0
    for i in range(n_nodes):
        choices = ["conv", "conv"]          # convs twice as likely
        if cur_ch is not None:
            if pools < 2:
                choices.append("pool")
            if any(c == cur_ch for _, c in named[:-1]):
                choices.append("res")
            if len(named) > 1:
                choices.append("dense")
        kind = rng.choice(choices)
        name = f"n{i}"
        if kind == "conv":
            k = int(rng.choice([1, 3, 5]))
            c = int(rng.choice([4, 8]))
            arch.append({"conv2d": [name, {"kernel_size": [k, k],
                                           "out_channels": c,
                                           "padding": k // 2}]})
            cur_ch = c
        elif kind == "pool":
            arch.append({"average_pooling": [name, {"kernel_size": [2, 2],
                                                    "stride": [2, 2]}]})
            pools += 1
        elif kind == "res":
            cands = [n for n, c in named[:-1] if c == cur_ch]
            src = str(rng.choice(cands))
            arch.append({"residual_link": [name, {"_from": src,
                                                  "allow_scaling": True}]})
        else:
            src = str(rng.choice([n for n, _ in named[:-1]]))
            arch.append({"dense_link": [name, {"_from": src,
                                               "allow_scaling": True}]})
            cur_ch = cur_ch + dict(named)[src]
        named.append((name, cur_ch))
    arch.append({"flatten": {}})
    arch.append({"fully_connected": {"out_features": 4, "act_fn": None,
                                     "batch_norm": None, "group_norm": None,
                                     "layer_norm": None}})
    hp = {"act_fn": "relu", "dropout_prob": 0.0, "architecture": arch}
    norm = rng.choice(["none", "batch_norm", "group_norm", "layer_norm"])
    if norm == "batch_norm":
        hp["batch_norm"] = {"momentum": 0.1, "eps": 1e-5}
    elif norm == "group_norm":
        hp["group_norm"] = {"num_groups": 4, "eps": 1e-5}
    elif norm == "layer_norm":
        hp["layer_norm"] = {"eps": 1e-5}
    return hp


@pytest.mark.parametrize("seed", range(8))
def test_random_valid_spec_builds_runs_and_differentiates(seed):
    rng = np.random.default_rng(seed)
    hp = _random_hp(rng, n_nodes=int(rng.integers(4, 10)))
    m = DeepcvModule((HW, HW, 3), hp)
    v = m.init(jax.random.PRNGKey(seed))

    # deterministic construction: same spec + seed -> identical params
    v2 = m.init(jax.random.PRNGKey(seed))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(rng.normal(size=(2, HW, HW, 3)), jnp.float32)

    # eval_shape (what describe()/shape-inference reports) == execution
    predicted = jax.eval_shape(
        lambda vv, xx: m.apply(vv, xx, train=False), v, x)
    y = m.apply(v, x, train=False)
    assert y.shape == predicted.shape and y.dtype == predicted.dtype
    assert bool(jnp.isfinite(y).all()), f"non-finite output for seed {seed}"

    def loss(params):
        out = m.apply({"params": params, **{k: v[k] for k in v
                                            if k != "params"}},
                      x, train=False)
        return jnp.sum(out * out)

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf).all()), f"non-finite grad, seed {seed}"

    # the textual descriptor must render for any valid model
    assert "parameters" in str(m.describe()).lower() or str(m.describe())
