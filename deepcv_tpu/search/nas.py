"""Neural-architecture-search over spec-level choice points.

Reference parity (/root/reference/src/deepcv/meta/nni_tools.py):
  * classic NAS: generate a search space enumerating the spec's mutables
    (``gen_classic_nas_search_space`` shelled out to ``nnictl ss_gen``,
    :122-131 — here a pure function over the spec), sample one fixed
    architecture per trial (``get_and_apply_next_architecture``, :409);
  * single-shot NAS: train the weight-sharing supernet once then export the
    best fixed architecture (``nni_single_shot_neural_architecture_search``,
    :231-343). The supernet is DARTS-style: DeepcvModule(nas_mode='supernet')
    mixes candidates with softmax-weighted trainable logits (spec/graph.py);
    export takes argmax per mutable (`mutator.export()` parity, JSON format
    compatible with NNI fixed-architecture files);
  * ``apply_fixed_architecture`` (:424): build a fixed model from an exported
    JSON;
  * ``model_contains_nni_nas_mutable`` (:92-101) -> :func:`list_mutables`.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from deepcv_tpu.spec.tokens import YamlTokens as T
from deepcv_tpu.spec.graph import ARCH_PARAM_PREFIX

__all__ = ["list_mutables", "sample_architecture", "export_architecture",
           "apply_fixed_architecture", "arch_params_mask",
           "gen_classic_nas_search_space", "candidate_costs",
           "enas_neural_architecture_search", "LstmController",
           "expected_cost_regularizer",
           "single_shot_neural_architecture_search"]

_logger = logging.getLogger(__name__)


def list_mutables(hp: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Enumerate NAS choice points in an architecture spec.

    Returns {mutable_name: {'kind': 'layer'|'input', 'n_candidates': k,
    'n_chosen': m}} — walks nested modules too.
    """
    out: Dict[str, Dict[str, Any]] = {}

    def walk(arch, prefix=""):
        for idx, entry in enumerate(arch or []):
            if not isinstance(entry, Mapping):
                continue
            for key, val in entry.items():
                if key == T.NAS_LAYER_CHOICE:
                    params = dict(val)
                    name = params.get(T.NAME, f"_submodule_{idx}_layer_choice")
                    cands = params.get(T.CANDIDATES, [])
                    out[prefix + name] = {"kind": "layer",
                                          "n_candidates": len(cands),
                                          "n_chosen": 1}
                elif key in (T.NESTED_DEEPCV_MODULE, T.NESTED_DEEPCV_MODULE_ALT):
                    # nested mutables are namespaced '<nested_name>/<name>'
                    # (mirrors graph.py node naming + the flax param scopes;
                    # a flat namespace silently collided auto-named mutables
                    # across nesting levels)
                    sub = val.get("architecture") if isinstance(val, Mapping) else val
                    nested_name = (val.get(T.NAME) if isinstance(val, Mapping)
                                   else None) or f"_submodule_{idx}_nested"
                    walk(sub, prefix=f"{prefix}{nested_name}/")
                elif isinstance(val, Mapping) and T.FROM_NAS_INPUT_CHOICE in val:
                    cands = val[T.FROM_NAS_INPUT_CHOICE]
                    name = val.get(T.NAME) or f"_submodule_{idx}_{str(key).lstrip('_')}"
                    out[prefix + name] = {"kind": "input",
                                          "n_candidates": len(cands),
                                          "n_chosen": int(val.get(T.N_CHOSEN, 1))}
                elif isinstance(val, (list, tuple)) and len(val) == 2 \
                        and isinstance(val[1], Mapping) and T.FROM_NAS_INPUT_CHOICE in val[1]:
                    out[prefix + val[0]] = {
                        "kind": "input",
                        "n_candidates": len(val[1][T.FROM_NAS_INPUT_CHOICE]),
                        "n_chosen": int(val[1].get(T.N_CHOSEN, 1))}
    walk(hp.get("architecture"))
    return out


def gen_classic_nas_search_space(hp: Mapping[str, Any]) -> Dict[str, Any]:
    """NNI classic-NAS search-space JSON for the spec's mutables
    (replaces the ``nnictl ss_gen`` subprocess, nni_tools.py:122-131)."""
    space = {}
    for name, m in list_mutables(hp).items():
        space[name] = {"_type": "layer_choice" if m["kind"] == "layer" else "input_choice",
                       "_value": list(range(m["n_candidates"]))}
    return space


def sample_architecture(hp: Mapping[str, Any], rng=None,
                        seed: Optional[int] = None) -> Dict[str, Any]:
    """Sample one fixed architecture (classic-NAS trial)."""
    rng = rng if rng is not None else np.random.default_rng(seed or 0)
    arch = {}
    for name, m in list_mutables(hp).items():
        if m["kind"] == "layer":
            arch[name] = int(rng.integers(m["n_candidates"]))
        else:
            k = min(m["n_chosen"], m["n_candidates"])
            arch[name] = sorted(int(i) for i in
                                rng.choice(m["n_candidates"], size=k, replace=False))
    return arch


def export_architecture(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Extract the argmax architecture from trained supernet variables
    (NNI ``mutator.export()`` parity, nni_tools.py:324-340): arch logits live
    in params under the ``arch__`` prefix (spec/graph.py)."""
    arch: Dict[str, Any] = {}

    def walk(tree, path=""):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                # nested SpecModules bind under 'node_impls_<name>' scopes:
                # extend the path so nested mutables export namespaced
                sub = path + k[len("node_impls_"):] + "/" \
                    if k.startswith("node_impls_") else path
                walk(v, sub)
            elif k.startswith(ARCH_PARAM_PREFIX):
                name = k[len(ARCH_PARAM_PREFIX):]
                arch[path + name] = int(np.argmax(np.asarray(v)))

    walk(variables.get("params", variables))
    return arch


def apply_fixed_architecture(input_shape, hp: Mapping[str, Any],
                             architecture: Union[str, Path, Mapping[str, Any]],
                             **model_kwargs):
    """Build a fixed DeepcvModule from an exported architecture JSON/dict
    (reference ``apply_fixed_architecture``, nni_tools.py:424)."""
    from deepcv_tpu.spec import DeepcvModule
    if isinstance(architecture, (str, Path)):
        architecture = json.loads(Path(architecture).read_text())
    return DeepcvModule(input_shape, hp, nas_mode="fixed",
                        nas_arch=dict(architecture), **model_kwargs)


def arch_params_mask(params: Mapping[str, Any], invert: bool = False):
    """Pytree mask: True on ``arch__*`` leaves (for optax.masked — e.g. give
    architecture logits their own learning rate / exclude from weight decay,
    DARTS bi-level optimization)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)
    paths, treedef = flat[0], flat[1]
    leaves = []
    for path, leaf in paths:
        is_arch = any(ARCH_PARAM_PREFIX in str(getattr(p, "key", "")) for p in path)
        leaves.append(is_arch if not invert else not is_arch)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _candidate_cost(candidate, in_shape) -> float:
    """Compute-cost estimate of one layer-choice candidate on its real input
    shape: trainable params x output spatial positions ~ MACs for convs,
    params for dense. Pure ``jax.eval_shape`` — zero FLOPs, no compile."""
    import jax
    import jax.numpy as jnp

    x = jax.ShapeDtypeStruct((1, *in_shape), jnp.float32)

    def init_out(x):
        vs = candidate.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        return candidate.apply(vs, x, train=False), vs

    out, vs = jax.eval_shape(init_out, x)
    params = vs.get("params", vs) if hasattr(vs, "get") else vs
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    spatial = int(np.prod(out.shape[1:-1])) if getattr(out, "ndim", 0) > 2 else 1
    return float(n_params * spatial)


def _arch_logits_get(params: Mapping[str, Any], name: str):
    """Arch logits for mutable ``name`` — nested mutables are addressed
    '<nested>/<local>' and live under 'node_impls_<nested>' param scopes."""
    parts = name.split("/")
    node = params
    for p in parts[:-1]:
        node = node[f"node_impls_{p}"]
    return node[f"{ARCH_PARAM_PREFIX}{parts[-1]}"]


def _arch_logits_set(params, name: str, value) -> None:
    """In-place update of (host, plain-dict) param trees — controller use."""
    parts = name.split("/")
    node = params
    for p in parts[:-1]:
        node = node[f"node_impls_{p}"]
    node[f"{ARCH_PARAM_PREFIX}{parts[-1]}"] = value


def _all_node_shapes(supernet) -> Dict[str, Any]:
    """Namespaced output shape of EVERY spec node (nested included): rewrap
    each (nested) SpecModule with a recording shape_cb and run ONE
    ``jax.eval_shape`` over the whole graph — zero FLOPs."""
    import jax
    import jax.numpy as jnp
    from deepcv_tpu.spec.graph import SpecModule

    shapes: Dict[str, Any] = {}

    def wrap(mod, prefix):
        impls = {k: (wrap(v, f"{prefix}{k}/") if isinstance(v, SpecModule)
                     else v) for k, v in mod.node_impls.items()}
        return mod.clone(node_impls=impls,
                         shape_cb=lambda n, s, _p=prefix:
                         shapes.__setitem__(_p + n, s))

    wrapped = wrap(supernet.module, "")
    x = jax.ShapeDtypeStruct((1, *supernet.input_shape), jnp.float32)

    def init_apply(x):
        vs = wrapped.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        return wrapped.apply(vs, x, train=False)

    jax.eval_shape(init_apply, x)
    return shapes


def candidate_costs(supernet) -> Dict[str, List[float]]:
    """Per-candidate cost table for every layer-choice mutable, nested
    modules included (keys '<nested>/<local>') — the ProxylessNAS latency
    table (arXiv:1812.00332 §3.2; measured latency on the target device is
    replaced by an analytic MAC estimate — swap in real measurements by
    passing your own table to :func:`expected_cost_regularizer`).
    Input-choice mutables carry no compute and are skipped."""
    from deepcv_tpu.spec.graph import SpecModule

    shapes = _all_node_shapes(supernet)
    costs: Dict[str, List[float]] = {}

    def walk(mod, prefix, in_shape):
        prev = in_shape
        for meta in mod.node_metas:
            full = prefix + meta.name
            impl = mod.node_impls[meta.name]
            if meta.kind == "choice":
                costs[full] = [_candidate_cost(c, tuple(prev)[1:])
                               for c in impl]
            elif isinstance(impl, SpecModule):
                walk(impl, f"{full}/", prev)
            s = shapes.get(full, prev)
            prev = s[0] if isinstance(s, list) else s

    walk(supernet.module, "", (1, *supernet.input_shape))
    return costs


def expected_cost_regularizer(costs: Mapping[str, Sequence[float]],
                              weight: float = 0.1):
    """Differentiable expected-architecture-cost term
    E[cost] = sum_mutable <softmax(logits), candidate_costs>, normalized by
    the most expensive architecture so ``weight`` is comparable to a task
    loss. Plugs into ``train(param_regularizer=...)`` — the ProxylessNAS
    latency objective (arXiv:1812.00332 eq. 7). Nested mutables resolve
    through their 'node_impls_*' param scopes."""
    import jax
    import jax.numpy as jnp

    total = sum(max(c) for c in costs.values()) or 1.0
    tables = {n: jnp.asarray(c, jnp.float32) for n, c in costs.items()}

    def reg(params):
        e = 0.0
        for name, cs in tables.items():
            logits = _arch_logits_get(params, name)
            e = e + jnp.dot(jax.nn.softmax(logits), cs)
        return weight * e / total

    return reg


class LstmController:
    """The ENAS paper's recurrent controller (arXiv:1802.03268 §2): an LSTM
    samples architecture decisions SEQUENTIALLY, each conditioned on the
    previous choices through the hidden state — so the policy is a joint
    distribution over architectures, not a product of per-mutable factors.

    Per step t: h_t = LSTM(embed(choice_{t-1}), h_{t-1}); logits_t = W_t h_t.
    Trained by REINFORCE (advantage-weighted log-prob + entropy bonus) with
    Adam, matching the paper's controller optimizer. Pure JAX: log pi and
    entropy differentiate through the unrolled cell with ``jax.grad``.
    """

    def __init__(self, sizes: Sequence[int], seed: int = 0,
                 embed_dim: int = 16, hidden_dim: int = 32, lr: float = 0.05,
                 entropy_weight: float = 1e-2):
        import jax
        import jax.numpy as jnp
        import optax

        self.sizes = [int(s) for s in sizes]
        self.H = hidden_dim
        rng = np.random.default_rng(seed)

        def init(*shape, scale=0.1):
            return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)

        self.params = {
            "x0": init(embed_dim),
            "wx": init(embed_dim, 4 * hidden_dim),
            "wh": init(hidden_dim, 4 * hidden_dim),
            "b": jnp.zeros((4 * hidden_dim,), jnp.float32),
            "head": [init(hidden_dim, n) for n in self.sizes],
            "head_b": [jnp.zeros((n,), jnp.float32) for n in self.sizes],
            "emb": [init(n, embed_dim) for n in self.sizes],
        }
        self._tx = optax.adam(float(lr))
        self._opt = self._tx.init(self.params)
        self._w_ent = float(entropy_weight)

        def cell(p, x, h, c):
            z = x @ p["wx"] + h @ p["wh"] + p["b"]
            i, f, g, o = jnp.split(z, 4)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            return jax.nn.sigmoid(o) * jnp.tanh(c), c

        def step_logits(p, t: int, x, h, c):
            h, c = cell(p, x, h, c)
            return h @ p["head"][t] + p["head_b"][t], h, c

        def logprob_entropy(p, choices):
            """log pi(arch) and policy entropy along the SAMPLED path
            (choices: int32[T]); unrolled — T is the mutable count."""
            h = jnp.zeros((self.H,))
            c = jnp.zeros((self.H,))
            x = p["x0"]
            lp = jnp.float32(0.0)
            ent = jnp.float32(0.0)
            for t in range(len(self.sizes)):
                logits, h, c = step_logits(p, t, x, h, c)
                logq = jax.nn.log_softmax(logits)
                lp = lp + logq[choices[t]]
                ent = ent - jnp.sum(jnp.exp(logq) * logq)
                x = p["emb"][t][choices[t]]
            return lp, ent

        def loss(p, arch_mat, adv):
            lps, ents = jax.vmap(lambda ch: logprob_entropy(p, ch))(arch_mat)
            return -(jnp.mean(adv * lps) + self._w_ent * jnp.mean(ents))

        self._grad = jax.jit(jax.grad(loss))
        self._step_logits = jax.jit(step_logits, static_argnums=(1,))
        self._logprob_entropy = logprob_entropy

    def _decode(self, pick) -> List[int]:
        import jax.numpy as jnp
        h = jnp.zeros((self.H,))
        c = jnp.zeros((self.H,))
        x = self.params["x0"]
        out = []
        for t in range(len(self.sizes)):
            logits, h, c = self._step_logits(self.params, t, x, h, c)
            ch = pick(t, np.asarray(logits, np.float64))
            out.append(int(ch))
            x = self.params["emb"][t][ch]
        return out

    def sample(self, rng: np.random.Generator) -> List[int]:
        def pick(t, logits):
            p = np.exp(logits - logits.max())
            return rng.choice(self.sizes[t], p=p / p.sum())
        return self._decode(pick)

    def greedy(self) -> List[int]:
        return self._decode(lambda t, logits: int(np.argmax(logits)))

    def marginals(self, rng: np.random.Generator, k: int = 64) -> List[np.ndarray]:
        """Empirical per-step marginals from k policy samples (used to point
        the supernet's path sampling at the current policy)."""
        counts = [np.full(n, 1e-3) for n in self.sizes]
        for _ in range(k):
            for t, ch in enumerate(self.sample(rng)):
                counts[t][ch] += 1.0
        return [c / c.sum() for c in counts]

    def entropy(self) -> float:
        import jax.numpy as jnp
        _, ent = self._logprob_entropy(self.params,
                                       jnp.asarray(self.greedy(), jnp.int32))
        return float(ent)

    def update(self, arch_rows: Sequence[Sequence[int]],
               advantages: Sequence[float]) -> None:
        import jax.numpy as jnp
        import optax
        g = self._grad(self.params, jnp.asarray(arch_rows, jnp.int32),
                       jnp.asarray(advantages, jnp.float32))
        upd, self._opt = self._tx.update(g, self._opt, self.params)
        self.params = optax.apply_updates(self.params, upd)


def enas_neural_architecture_search(
        input_shape, model_hp: Mapping[str, Any], training_hp: Mapping[str, Any],
        losses, datasets, backend_conf=None, metrics=None,
        arch_export_path: Optional[Union[str, Path]] = None,
        controller_lr: float = 0.2, controller_samples: int = 8,
        entropy_weight: float = 1e-2, baseline_decay: float = 0.7,
        reward_metric: str = "accuracy",
        reward_fn: Optional[Any] = None,
        controller: str = "factored",
        **model_kwargs) -> Tuple[Dict[str, Any], Any, Dict[str, Any]]:
    """ENAS (arXiv:1802.03268): weight sharing + an RL controller trained by
    REINFORCE on validation reward, alternating with weight training.

    Controller (``controller=``):
      * ``'factored'`` (default) — one independent softmax per mutable over
        the shared ``arch__*`` logits; covers the same search space with
        exact policy-gradient math
        (grad log pi(arch) = onehot(choice) - softmax(logits) per mutable);
      * ``'lstm'`` — the paper's recurrent controller
        (:class:`LstmController`): decisions sampled sequentially, each
        conditioned on previous choices through the LSTM state, REINFORCE +
        Adam (``controller_lr`` is the Adam lr here — 0.05-ish, not the
        0.2+ that suits the factored sign-SGD-style update). The weight
        phase samples paths from the controller's empirical MARGINALS
        (written into the ``arch__*`` logits): the joint policy drives the
        controller phase and the export, the marginal projection drives
        shared-weight path sampling — the one approximation vs the paper,
        which threads the sampler into every train step.

    Alternation (one round per weight epoch, the paper's schedule):
      1. WEIGHT phase — one epoch of shared-weight training with paths
         sampled from the CURRENT policy (supernet sampling='sampled');
         ``train_arch_params=False`` zeroes gradient flow into the logits
         so only REINFORCE moves the policy;
      2. CONTROLLER phase — sample ``controller_samples`` architectures on
         the host, score each on a validation batch with the shared weights
         (one-hot forced paths), and ascend
         (R - baseline) * grad log pi + entropy_weight * grad H
         with an EMA baseline (decay ``baseline_decay``).

    ``reward_fn(arch, state) -> float`` overrides the validation-accuracy
    reward (latency-aware or multi-objective searches; also what the unit
    test uses to verify the controller maximizes an arbitrary reward).

    Nested-module mutables participate ('<nested>/<local>' names route
    through their param scopes, like the cost table).

    Returns (architecture_dict, final_state, history) — history carries a
    'controller' list of per-round {reward_mean, baseline, entropy}.
    """
    import jax
    import jax.numpy as jnp
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.graph import clone_with_forced_arch
    from deepcv_tpu.train import train
    from deepcv_tpu.train.metrics import METRIC_FNS

    supernet = DeepcvModule(input_shape, model_hp, nas_mode="supernet",
                            nas_sampling="sampled", **model_kwargs)
    muts = list_mutables(model_hp)
    if not muts:
        raise ValueError("enas: the spec has no NAS mutables")
    if controller not in ("factored", "lstm"):
        raise ValueError(f"enas: unknown controller '{controller}' "
                         "(factored|lstm)")

    hp = dict(training_hp)
    epochs = int(hp.get("epochs", 1))
    base_seed = int(hp.get("seed", 0))
    hp.update(epochs=1, train_arch_params=False)
    rng = np.random.default_rng(base_seed + 1)

    lstm = None
    mut_names = list(muts)
    if controller == "lstm":
        # candidate counts per mutable WITHOUT running a real init: the
        # arch__ logits' shapes come from one eval_shape of the initializer
        var_shapes = jax.eval_shape(supernet.init, jax.random.PRNGKey(0))
        sizes = [_arch_logits_get(var_shapes["params"], n).shape[0]
                 for n in mut_names]
        lstm = LstmController(sizes, seed=base_seed + 2,
                              lr=float(controller_lr),
                              entropy_weight=float(entropy_weight))

    # default reward: accuracy of the forced-arch model on a validation batch
    validset = datasets.get("validset", datasets["trainset"])
    inner = getattr(validset, "dataset", validset)
    n = min(len(inner), 512)
    vx = jnp.asarray(inner.images[:n])
    vy = jnp.asarray(inner.targets[:n])
    tf = getattr(validset, "batch_transform", None)
    vxb = tf(vx, augment=False) if tf is not None else vx
    metric_fn = METRIC_FNS[reward_metric]
    _eval_cache: Dict[Tuple, Any] = {}

    def default_reward(arch, state) -> float:
        forced = clone_with_forced_arch(supernet.module, arch)
        key = tuple(sorted(arch.items()))
        fn = _eval_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda v, x: forced.apply(v, x, train=False))
            _eval_cache[key] = fn
        logits = fn(state.variables(), vxb)
        return float(metric_fn(logits, vy))

    reward_of = reward_fn or default_reward

    state = None
    history: Dict[str, Any] = {"train": [], "valid": [], "controller": []}
    baseline = None
    variables = None
    for epoch in range(epochs):
        # ---- weight phase (paths ~ current policy; logits frozen) -------- #
        # per-round seed offset: each round must see a DIFFERENT shuffle /
        # augmentation / path-sampling stream (a fixed seed would replay the
        # same epoch ordering every round). Known approximation vs the
        # paper: optimizer moments and the LR schedule restart each round
        # (train() owns its opt_state) — acceptable at controller-search
        # scale, retrain the exported arch from scratch regardless.
        state, h = train(dict(hp, seed=base_seed + epoch), supernet, losses,
                         datasets, backend_conf=backend_conf, metrics=metrics,
                         init_variables=variables)
        history["train"].extend(h["train"])
        history["valid"].extend(h["valid"])
        params = jax.device_get(state.params)
        variables = {"params": params}
        if state.batch_stats is not None:
            variables["batch_stats"] = jax.device_get(state.batch_stats)

        if lstm is not None:
            # ---- controller phase (REINFORCE through the LSTM policy) ---- #
            rows, advs, rewards = [], [], []
            for _s in range(int(controller_samples)):
                row = lstm.sample(rng)
                arch = dict(zip(mut_names, row))
                r = float(reward_of(arch, state))
                rewards.append(r)
                baseline = r if baseline is None else \
                    baseline_decay * baseline + (1 - baseline_decay) * r
                rows.append(row)
                advs.append(r - baseline)
            lstm.update(rows, advs)
            # point the supernet's path sampling at the updated policy: its
            # per-mutable 'arch__' logits become the policy's log-marginals
            for name, m in zip(mut_names, lstm.marginals(rng)):
                cur = np.asarray(_arch_logits_get(params, name))
                _arch_logits_set(params, name,
                                 jnp.asarray(np.log(m), cur.dtype))
            variables["params"] = params
            ent = lstm.entropy()
            history["controller"].append({
                "epoch": epoch + 1,
                "reward_mean": float(np.mean(rewards)),
                "baseline": float(baseline),
                "entropy": ent})
            _logger.info("enas[lstm] round %d: reward %.4f baseline %.4f "
                         "entropy %.3f", epoch + 1, np.mean(rewards),
                         baseline, ent)
            continue

        # ---- controller phase (REINFORCE over the factored policy) ------- #
        logits = {name: np.asarray(_arch_logits_get(params, name), np.float64)
                  for name in muts}
        probs = {n: np.exp(l - l.max()) / np.exp(l - l.max()).sum()
                 for n, l in logits.items()}
        grads = {n: np.zeros_like(l) for n, l in logits.items()}
        rewards = []
        for _s in range(int(controller_samples)):
            arch = {n: int(rng.choice(len(p), p=p)) for n, p in probs.items()}
            r = float(reward_of(arch, state))
            rewards.append(r)
            baseline = r if baseline is None else \
                baseline_decay * baseline + (1 - baseline_decay) * r
            adv = r - baseline
            for n_, c in arch.items():
                onehot = np.zeros_like(probs[n_])
                onehot[c] = 1.0
                grads[n_] += adv * (onehot - probs[n_])
        ent = 0.0
        for n_, p in probs.items():
            logp = np.log(p + 1e-12)
            h_n = float(-(p * logp).sum())
            ent += h_n
            # dH/dlogit_i = -p_i (log p_i + H)  (softmax jacobian form)
            grads[n_] += entropy_weight * (-p * (logp + h_n))
        for n_ in muts:
            new = logits[n_] + controller_lr * grads[n_] / max(1, controller_samples)
            _arch_logits_set(params, n_, jnp.asarray(
                new, np.asarray(_arch_logits_get(params, n_)).dtype))
        variables["params"] = params
        history["controller"].append({
            "epoch": epoch + 1,
            "reward_mean": float(np.mean(rewards)),
            "baseline": float(baseline),
            "entropy": ent})
        _logger.info("enas round %d: reward %.4f baseline %.4f entropy %.3f",
                     epoch + 1, np.mean(rewards), baseline, ent)

    if lstm is not None:
        # export = greedy decode through the joint policy (each argmax
        # conditioned on the previous decisions via the LSTM state)
        arch = dict(zip(mut_names, lstm.greedy()))
    else:
        arch = {n: int(np.argmax(np.asarray(_arch_logits_get(params, n))))
                for n in muts}
    if arch_export_path:
        Path(arch_export_path).parent.mkdir(parents=True, exist_ok=True)
        Path(arch_export_path).write_text(json.dumps(arch, indent=1))
    return arch, state, history


def single_shot_neural_architecture_search(
        input_shape, model_hp: Mapping[str, Any], training_hp: Mapping[str, Any],
        losses, datasets, backend_conf=None, metrics=None,
        arch_export_path: Optional[Union[str, Path]] = None,
        algorithm: str = "darts", eval_candidates: Optional[bool] = None,
        eval_metric: str = "accuracy", max_eval_archs: int = 16,
        latency_weight: float = 0.1,
        **model_kwargs) -> Tuple[Dict[str, Any], Any, Dict[str, Any]]:
    """Single-shot (weight-sharing) NAS: train the supernet, export the arch.

    Reference ``nni_single_shot_neural_architecture_search``
    (nni_tools.py:231-343) with its algorithm registry {ENAS, SPOS,
    ProxylessNAS}. Three genuinely distinct regimes:
      * algorithm='darts': softmax MIXTURE over trainable arch logits every
        step; export = argmax of the trained logits;
      * algorithm='spos': ONE path sampled UNIFORMLY per step (logits stay
        untrained — pure weight sharing); the architecture is then selected
        by scoring candidates on validation with the shared weights
        (``eval_candidates`` defaults ON for spos);
      * algorithm='proxylessnas': binary-gate path sampling — ONE path drawn
        from softmax(logits) per step with the straight-through gate
        estimator (paper eq. 4) training the logits, PLUS the expected-cost
        (latency) objective ``latency_weight * E[cost]/max_cost`` added to
        the training loss (eq. 7; analytic MAC table, see
        :func:`candidate_costs`).
    'enas' dispatches to :func:`enas_neural_architecture_search` — a REAL
    RL controller (factored policy + REINFORCE on validation reward with an
    EMA baseline), alternating weight/controller phases per epoch.

    ``eval_candidates=True`` scores each candidate architecture on the
    validation set with the shared weights and exports the best (reference
    ``_single_shot_nas_retrain_for_eval`` intent, nni_tools.py:193-228 — the
    BN-stat reset happens implicitly because the fixed-arch evaluation
    recomputes activations with eval-mode stats). Default: ON for spos
    (required — its logits are untrained), OFF otherwise.

    Returns (architecture_dict, final_state, history).
    """
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train import train

    algorithm = str(algorithm).lower()
    sampling = {"darts": "softmax", "spos": "uniform", "enas": "sampled",
                "proxylessnas": "sampled"}.get(algorithm)
    if sampling is None:
        raise ValueError(f"Unknown single-shot NAS algorithm '{algorithm}' "
                         "(darts|spos|enas|proxylessnas)")
    if algorithm == "enas":
        # the RL-controller loop owns its own weight/controller alternation
        return enas_neural_architecture_search(
            input_shape, model_hp, training_hp, losses, datasets,
            backend_conf=backend_conf, metrics=metrics,
            arch_export_path=arch_export_path,
            reward_metric=eval_metric, **model_kwargs)
    if eval_candidates is None:
        eval_candidates = algorithm == "spos"
    supernet = DeepcvModule(input_shape, model_hp, nas_mode="supernet",
                            nas_sampling=sampling, **model_kwargs)
    reg = None
    if algorithm == "proxylessnas" and latency_weight:
        costs = candidate_costs(supernet)
        if costs:
            _logger.info("proxylessnas candidate cost table: %s", costs)
            reg = expected_cost_regularizer(costs, weight=latency_weight)
    state, history = train(training_hp, supernet, losses, datasets,
                           backend_conf=backend_conf, metrics=metrics,
                           param_regularizer=reg)
    arch = export_architecture({"params": state.params})

    if eval_candidates:
        arch = _select_arch_by_validation(
            input_shape, model_hp, state, datasets, losses, arch,
            metric=eval_metric, max_archs=max_eval_archs, supernet=supernet,
            **model_kwargs)

    if arch_export_path:
        Path(arch_export_path).parent.mkdir(parents=True, exist_ok=True)
        Path(arch_export_path).write_text(json.dumps(arch, indent=1))
        _logger.info("exported architecture to %s: %s", arch_export_path, arch)
    return arch, state, history


def _select_arch_by_validation(input_shape, model_hp, state, datasets, losses,
                               default_arch, metric: str = "accuracy",
                               max_archs: int = 16, supernet=None, **model_kwargs):
    """Enumerate candidate architectures (capped), score each by FORCING its
    one-hot path on the trained supernet (identical param tree -> true weight
    sharing), return the best-scoring architecture."""
    import itertools
    import jax.numpy as jnp
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train.metrics import METRIC_FNS

    muts = list_mutables(model_hp)
    axes = []
    for name, m in muts.items():
        if m["kind"] == "layer":
            axes.append([(name, i) for i in range(m["n_candidates"])])
        else:
            axes.append([(name, [i]) for i in range(m["n_candidates"])])
    total = int(np.prod([len(a) for a in axes])) if axes else 0
    if not total:
        return default_arch
    if total <= max_archs:
        combos = list(itertools.product(*axes))
    else:
        # a lexicographic islice would pin the leading mutables to candidate
        # 0 and never explore most of the space — sample uniformly instead,
        # and say what fraction was covered
        rng = np.random.default_rng(0)
        seen = set()
        while len(seen) < max_archs:
            seen.add(tuple(a[rng.integers(len(a))] for a in axes))
        combos = list(seen)
        _logger.info("candidate evaluation sampled %d of %d architectures "
                     "uniformly (raise max_eval_archs for wider coverage)",
                     max_archs, total)
    if supernet is None:
        supernet = DeepcvModule(input_shape, model_hp, nas_mode="supernet",
                                **model_kwargs)

    validset = datasets.get("validset", datasets["trainset"])
    inner = getattr(validset, "dataset", validset)
    n = min(len(inner), 512)
    x = jnp.asarray(inner.images[:n])
    y = jnp.asarray(inner.targets[:n])
    tf = getattr(validset, "batch_transform", None)
    xb = tf(x, augment=False) if tf is not None else x
    metric_fn = METRIC_FNS.get(metric)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    best, best_score = default_arch, -float("inf")
    for combo in combos:
        arch = dict(combo)
        from deepcv_tpu.spec.graph import clone_with_forced_arch
        forced = clone_with_forced_arch(supernet.module, arch)
        logits = forced.apply(variables, xb, train=False)
        if metric_fn is not None:
            score = float(metric_fn(logits, y))
        else:
            from deepcv_tpu.train.losses import WeightedLosses
            wl = losses if isinstance(losses, WeightedLosses) else WeightedLosses(losses)
            score = -float(wl(logits, y)[0])
        _logger.info("candidate arch %s: %s=%.4f", arch, metric, score)
        if score > best_score:
            best, best_score = arch, score
    return best
