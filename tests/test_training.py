"""Training runtime tests: losses, schedules, optimizer mapping, backend,
end-to-end loop (multi-device via the 8-device CPU mesh from conftest),
crash/resume, checkpoint best-k."""
import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train import (
    train, BackendConfig, cross_entropy_loss, WeightedLosses,
    jensen_shannon_divergence_consistency_loss, triplet_margin_loss,
    piecewise_linear, one_cycle,
)
from deepcv_tpu.train.schedules import safe_eval_milestones, build_schedule
from deepcv_tpu.train.training import build_optimizer, CrashIteration, TrainState
from deepcv_tpu.train.metrics import accuracy, MetricAccumulator
from deepcv_tpu.train.checkpoint import CheckpointManager

MODEL_YML = """
act_fn: relu
batch_norm: { momentum: 0.1 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - flatten: {}
  - fully_connected: { act_fn: null, out_features: 4, batch_norm: null }
"""


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    raw = load_dataset("synthetic", n=256, image_shape=(8, 8, 3), num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]},
                      cache_dir=tmp_path_factory.mktemp("stats"))
    model = DeepcvModule((8, 8, 3), load_yaml(MODEL_YML))
    return model, data


# ------------------------------------------------------------------ losses --

def test_cross_entropy_and_smoothing():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert float(cross_entropy_loss(logits, labels)) < 1e-3
    assert float(cross_entropy_loss(logits, labels, label_smoothing=0.2)) > 0.5


def test_jsd_consistency_zero_for_identical():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    v = jensen_shannon_divergence_consistency_loss(logits, logits, logits)
    assert float(v) < 1e-6
    other = jax.random.normal(jax.random.PRNGKey(1), (4, 10)) * 5
    assert float(jensen_shannon_divergence_consistency_loss(logits, other)) > 0.01
    # gradient stops on the clean branch
    g = jax.grad(lambda l: jensen_shannon_divergence_consistency_loss(
        jax.lax.stop_gradient(l), l))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_triplet_margin():
    a = jnp.zeros((2, 4))
    pos = jnp.ones((2, 4)) * 0.1
    neg = jnp.ones((2, 4)) * 10
    assert float(triplet_margin_loss(a, pos, neg, margin=1.0)) == 0.0
    assert float(triplet_margin_loss(a, neg, pos, margin=1.0)) > 1.0


def test_weighted_losses_main_loss():
    wl = WeightedLosses({"ce": (cross_entropy_loss, 2.0),
                         "ce2": (cross_entropy_loss, 1.0)})
    logits = jnp.asarray([[1.0, -1.0]])
    labels = jnp.asarray([0])
    main, terms = wl(logits, labels)
    assert set(terms) == {"ce", "ce2", "main_loss"}
    assert np.isclose(float(main), float(terms["ce"]))  # equal terms -> same mean


# ---------------------------------------------------------------- schedules --

def test_piecewise_linear_interp():
    s = piecewise_linear([[0, 0.0], [10, 1.0], [20, 0.0]])
    assert float(s(0)) == 0.0
    assert np.isclose(float(s(5)), 0.5)
    assert np.isclose(float(s(10)), 1.0)
    assert np.isclose(float(s(15)), 0.5)
    assert float(s(25)) == 0.0  # clamped


def test_one_cycle_shape():
    lr, mom = one_cycle(max_lr=0.1, total_steps=100, pct_start=0.3)
    assert float(lr(0)) < float(lr(30))
    assert np.isclose(float(lr(30)), 0.1, atol=1e-3)
    assert float(lr(99)) < 1e-3
    assert float(mom(30)) < float(mom(0))  # momentum inverse-cycles


def test_safe_eval_milestones_reference_string():
    hp = {"epochs": 2, "optimizer_opts": {"lr": 1e-3}}
    expr = ("[[0, 0.0], [int(0.2 * hp['epochs'] * iterations), "
            "hp['optimizer_opts']['lr']], [hp['epochs'] * iterations, 0.0]]")
    out = safe_eval_milestones(expr, {"hp": hp, "iterations": 100})
    assert out == [[0, 0.0], [40, 1e-3], [200, 0.0]]


def test_safe_eval_rejects_unsafe():
    with pytest.raises(ValueError):
        safe_eval_milestones("__import__('os').system('true')", {})
    with pytest.raises(ValueError):
        safe_eval_milestones("open('/etc/passwd')", {})
    with pytest.raises(ValueError):
        safe_eval_milestones("unknown_name + 1", {})


def test_build_schedule_reference_spec():
    spec = load_yaml("""
type: !py!ignite.contrib.handlers.PiecewiseLinear
eval_args: ["milestones_values"]
kwargs:
  param_name: "lr"
  milestones_values: "[[0, 0.0], [int(0.2 * hp['epochs'] * iterations), hp['optimizer_opts']['lr']], [hp['epochs'] * iterations, 0.0]]"
""")
    s = build_schedule(spec, {"epochs": 2, "optimizer_opts": {"lr": 1e-2}}, 50)
    assert np.isclose(float(s(20)), 1e-2)


# ---------------------------------------------------------------- optimizer --

def test_build_optimizer_reference_opts():
    import optax
    # exact reference AdamW opts (parameters.yml:129-134)
    tx = build_optimizer("adamw", {"lr": 1e-3, "betas": [0.9, 0.999], "eps": 1e-08,
                                   "weight_decay": 1e-2, "amsgrad": False})
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    up, _ = tx.update({"w": jnp.ones((3,))}, st, params)
    assert up["w"].shape == (3,)
    tx2 = build_optimizer("sgd", {"lr": 0.1, "momentum": 1e-4, "weight_decay": 0.0,
                                  "nesterov": True})
    assert tx2.init(params) is not None
    with pytest.raises(ValueError, match="Unknown optimizer"):
        build_optimizer("adagrad_nope", {"lr": 1.0})


def test_build_schedules_multi_and_bare_string():
    """README:122 'multiple schedulers' + :127 momentum/L2 policies: the
    mapping form builds one schedule per optimizer hyperparameter; the bare
    `scheduler: one_cycle` string (parameters.yml:426) derives max_lr /
    total_steps from the hp and returns the inverse momentum cycle too."""
    from deepcv_tpu.train.schedules import build_schedules
    hp = {"epochs": 2, "optimizer_opts": {"lr": 1e-2}}
    s = build_schedules("one_cycle", hp, 50)  # 100 total steps
    assert set(s) == {"lr", "momentum"}
    assert np.isclose(float(s["lr"](30)), 1e-2)          # peak at pct_start
    assert float(s["momentum"](30)) < float(s["momentum"](0))
    multi = build_schedules({
        "lr": {"type": "cosine", "kwargs": {"init_value": 1e-2, "decay_steps": 100}},
        "weight_decay": {"type": "piecewise_linear",
                         "kwargs": {"milestones_values": [[0, 0.0], [100, 0.1]]}},
    }, hp, 50)
    assert set(multi) == {"lr", "weight_decay"}
    assert np.isclose(float(multi["weight_decay"](50)), 0.05)
    with pytest.raises(ValueError, match="Unknown scheduler targets"):
        build_schedules({"dropout": {"type": "constant"}}, hp, 50)


def test_scheduled_weight_decay_and_momentum_advance():
    """inject_hyperparams path: with ZERO gradients an adamw update is pure
    decoupled decay -lr*wd(t)*p — wd scheduled 0 -> 0.1 must produce a zero
    first update and a nonzero second one."""
    import optax
    from deepcv_tpu.train.schedules import piecewise_linear
    wd = piecewise_linear([[0, 0.0], [1, 0.1]])
    mom = piecewise_linear([[0, 0.9], [1, 0.5]])
    params = {"w": jnp.ones((4,))}
    zero_g = {"w": jnp.zeros((4,))}
    tx = build_optimizer("adamw", {"lr": 1e-3}, None,
                         extra_schedules={"weight_decay": wd, "momentum": mom})
    st = tx.init(params)
    u0, st = tx.update(zero_g, st, params)
    u1, st = tx.update(zero_g, st, params)
    np.testing.assert_allclose(np.asarray(u0["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(u1["w"]), -1e-3 * 0.1, rtol=1e-5)
    # sgd: the momentum hyperparameter visibly advances in the state
    tx2 = build_optimizer("sgd", {"lr": 0.1}, None, extra_schedules={"momentum": mom})
    st2 = tx2.init(params)
    _, st2 = tx2.update(zero_g, st2, params)
    _, st2 = tx2.update(zero_g, st2, params)
    assert np.isclose(float(st2.hyperparams["momentum"]), 0.5)
    with pytest.raises(ValueError, match="adamw, adam, sgd"):
        build_optimizer("adafactor", {"lr": 1e-3}, None,
                        extra_schedules={"weight_decay": wd})


def test_lr_scales_per_layer(tiny_setup, tmp_path):
    """README:127 per-layer LR scales: scale 0.0 freezes the matched block
    (conv params bit-identical to init), unmatched head still trains, and
    the run composes with a multi-target scheduler."""
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 64, "optimizer": "sgd",
          "optimizer_opts": {"lr": 3e-3, "momentum": 0.9},
          "scheduler": {"lr": {"type": "constant", "kwargs": {"value": 3e-3}},
                        "momentum": {"type": "piecewise_linear",
                                     "kwargs": {"milestones_values": [[0, 0.95], [100, 0.85]]}}},
          "lr_scales": {"conv2d": 0.0, ".*": 1.0},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    init_vars = model.init(jax.random.PRNGKey(11))
    state, hist = train(hp, model, cross_entropy_loss, data,
                        backend_conf=BackendConfig(),
                        init_variables=init_vars)
    flat0 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]}
    moved = frozen = 0
    for k in flat0:
        same = np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k]))
        if "conv2d" in k:
            assert same, f"scaled-to-0 param {k} moved"
            frozen += 1
        elif "kernel" in k or "bias" in k:
            moved += 0 if same else 1
    assert frozen >= 1 and moved >= 1


def test_build_optimizer_adafactor_and_lion():
    """TPU-era additions: adafactor's factored second moments hold
    SUB-LINEAR optimizer memory (rows+cols, not a full moment matrix);
    lion keeps exactly one moment and its update is pure sign (every
    entry +-lr modulo weight decay)."""
    import numpy as np
    import optax
    params = {"w": jnp.ones((256, 512)) * 0.1}
    tx = build_optimizer("adafactor", {"lr": 1e-2})
    st = tx.init(params)
    g = {"w": jnp.ones((256, 512)) * 0.3}
    up, st = tx.update(g, st, params)
    assert up["w"].shape == (256, 512)
    moments = sum(x.size for x in jax.tree_util.tree_leaves(st)
                  if hasattr(x, "size"))
    assert moments < 256 * 512  # factored: far under one full moment

    tx = build_optimizer("lion", {"lr": 3e-4, "weight_decay": 0.0})
    st = tx.init(params)
    up, _ = tx.update(g, st, params)
    np.testing.assert_allclose(np.abs(np.asarray(up["w"])), 3e-4, rtol=1e-5)
    n_state = sum(x.size for x in jax.tree_util.tree_leaves(st)
                  if hasattr(x, "size"))
    assert n_state <= 256 * 512 + 2  # one moment (Adam keeps two)


def test_build_optimizer_muon():
    """Muon orthogonalizes the 2-D momentum: the update of a matrix param
    is ~orthogonal (U @ U.T ~ c*I — Newton-Schulz drives singular values
    to 1), while non-2-D params take the internal AdamW path."""
    import numpy as np
    params = {"w": jnp.ones((64, 32)) * 0.1, "b": jnp.zeros((32,))}
    g = {"w": jax.random.normal(jax.random.PRNGKey(0), (64, 32)),
         "b": jnp.ones((32,)) * 0.1}
    tx = build_optimizer("muon", {"lr": 1e-2})
    st = tx.init(params)
    up, _ = tx.update(g, st, params)
    u = np.asarray(up["w"], np.float64) / 1e-2  # undo lr scale
    gram = u.T @ u
    off = gram - np.diag(np.diag(gram))
    # near-orthogonal columns: off-diagonal mass far below diagonal mass
    assert np.abs(off).max() < 0.35 * np.abs(np.diag(gram)).mean(), (
        np.abs(off).max(), np.abs(np.diag(gram)).mean())
    assert up["b"].shape == (32,) and np.all(np.isfinite(np.asarray(up["b"])))

    # weight_decay must reach BOTH partitions (optax routes non-2-D params
    # through an internal AdamW whose decay defaults to 0): zero grads ->
    # the update is pure decay, nonzero on matrix AND bias
    params_wd = {"w": jnp.ones((8, 8)), "b": jnp.ones((8,))}
    g0 = {"w": jnp.zeros((8, 8)), "b": jnp.zeros((8,))}
    txd = build_optimizer("muon", {"lr": 1.0, "weight_decay": 0.1})
    upd, _ = txd.update(g0, txd.init(params_wd), params_wd)
    assert float(upd["w"][0, 0]) != 0.0 and float(upd["b"][0]) != 0.0


# ------------------------------------------------------------------ backend --

def test_backend_mesh(devices):
    be = BackendConfig()
    assert be.n_devices == len(devices) == 8
    assert be.data_axis == "data"
    assert str(be).startswith("cpu-x8")
    with pytest.raises(ValueError, match="mesh_shape"):
        BackendConfig(mesh_shape=(3,))
    # reference torch kwargs accepted & ignored
    BackendConfig(dist_backend="nccl", dist_url="env://", local_rank=0)


# ----------------------------------------------------------------- training --

def test_train_loss_decreases_multidevice(tiny_setup, tmp_path):
    model, data = tiny_setup
    hp = {"epochs": 3, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    state, hist = train(hp, model, cross_entropy_loss, data,
                        backend_conf=BackendConfig())
    assert hist["train"][-1]["main_loss"] < hist["train"][0]["main_loss"]
    assert len(hist["valid"]) == 3
    assert isinstance(state, TrainState) and int(state.step) == hist["steps"]


def test_train_tensor_parallel(tiny_setup, tmp_path):
    """dp x tp training: BackendConfig(tensor_parallel=2) shards kernel
    out-features over a 'model' axis; training must still converge and the
    result must match the pure-DP run exactly (sharding is layout, not math)."""
    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    be = BackendConfig(tensor_parallel=2)
    assert dict(be.mesh.shape) == {"data": 4, "model": 2}
    state, hist = train(dict(hp), model, cross_entropy_loss, data,
                        backend_conf=be)
    assert hist["train"][-1]["main_loss"] < hist["train"][0]["main_loss"]
    # the conv kernel (out_channels=8, divisible by 2) is model-sharded
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: str(getattr(l, "sharding", "")), state.params)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]}
    assert any("model" in v for k, v in flat.items() if "kernel" in k), flat
    # math unchanged vs a single-device run (sharding is layout, not math)
    state_dp, hist_dp = train(dict(hp), model, cross_entropy_loss, data,
                              backend_conf=BackendConfig(n_devices=1))
    np.testing.assert_allclose(hist["train"][-1]["main_loss"],
                               hist_dp["train"][-1]["main_loss"],
                               rtol=1e-4, atol=1e-5)


def test_runtime_lr_injects_and_applies(tiny_setup, tmp_path):
    """runtime_lr=True: the LR lives in opt_state (inject_hyperparams) so
    LR-sweep trials share one HLO — and it must still ACT as the LR (zero lr
    => zero movement; normal lr => loss decreases)."""
    model, data = tiny_setup
    base = {"epochs": 2, "batch_size": 64, "optimizer": "adamw",
            "save_every_iters": 0, "log_progress_every_iters": 1,
            "validate_every_epochs": 1000, "output_path": str(tmp_path),
            "seed": 7, "runtime_lr": True}
    state, hist = train(dict(base, optimizer_opts={"lr": 3e-3}), model,
                        cross_entropy_loss, data,
                        backend_conf=BackendConfig())
    assert hist["train"][-1]["main_loss"] < hist["train"][0]["main_loss"]
    # the injected LR is an opt_state leaf, not a compiled-in constant
    leaves = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
    lr_leaves = [l for p, l in leaves if "learning_rate" in
                 jax.tree_util.keystr(p)]
    assert lr_leaves and float(lr_leaves[0]) == pytest.approx(3e-3)
    # lr=0: AdamW moves nothing (decay is also lr-scaled in optax.adamw) —
    # same seed trained 1 vs 2 epochs must land on identical params
    s1, _ = train(dict(base, epochs=1, optimizer_opts={"lr": 0.0}), model,
                  cross_entropy_loss, data, backend_conf=BackendConfig())
    s2, _ = train(dict(base, epochs=2, optimizer_opts={"lr": 0.0}), model,
                  cross_entropy_loss, data, backend_conf=BackendConfig())
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(a, b)


def test_sigterm_handler_restored_after_train(tiny_setup, tmp_path):
    """train(handle_preemption=True) must restore the caller's SIGTERM
    handler on exit (r3 advisor: a leaked handler makes a later SIGTERM
    silently arm _PREEMPTION and spuriously stop the NEXT train())."""
    import signal as _sig
    from deepcv_tpu.train.training import _PREEMPTION
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1_000_000,
          "validate_every_epochs": 1000, "output_path": str(tmp_path),
          "seed": 7, "handle_preemption": True}
    prev = _sig.signal(_sig.SIGTERM, _sig.SIG_IGN)
    try:
        train(dict(hp), model, cross_entropy_loss, data,
              backend_conf=BackendConfig())
        assert _sig.getsignal(_sig.SIGTERM) is _sig.SIG_IGN
        assert not _PREEMPTION.is_set()
    finally:
        _sig.signal(_sig.SIGTERM, prev)


def test_flatten_optimizer_matches_per_tensor_math(tiny_setup, tmp_path):
    """flatten_optimizer=True runs ONE fused update over the raveled param
    vector (launch-bound per-tensor kernels were ~25% of the profiled
    ResNet-50 step) — and must be numerically identical to the per-tensor
    path."""
    model, data = tiny_setup
    base = {"epochs": 2, "batch_size": 64, "optimizer": "adamw",
            "optimizer_opts": {"lr": 3e-3}, "save_every_iters": 0,
            "log_progress_every_iters": 1, "validate_every_epochs": 1000,
            "output_path": str(tmp_path), "seed": 7}
    s_flat, h_flat = train(dict(base, flatten_optimizer=True), model,
                           cross_entropy_loss, data,
                           backend_conf=BackendConfig())
    s_ref, h_ref = train(dict(base), model, cross_entropy_loss, data,
                         backend_conf=BackendConfig())
    np.testing.assert_allclose(h_flat["train"][-1]["main_loss"],
                               h_ref["train"][-1]["main_loss"],
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_flat.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_sync_every_dispatches_window_timing(tiny_setup, tmp_path):
    """sync_every_dispatches > 1: the host-step sync (and its throughput
    entry) happens once per window — first two dispatch groups always sync
    (compile / first-run isolation), then every k-th, then the final one —
    while training math is untouched."""
    model, data = tiny_setup
    base = {"batch_size": 64, "optimizer_opts": {"lr": 3e-3},
            "save_every_iters": 0, "log_progress_every_iters": 1_000_000,
            "validate_every_epochs": 1000, "output_path": str(tmp_path),
            "seed": 7, "device_resident_dataset": True}
    hp = dict(base, epochs=6, sync_every_dispatches=3)
    state, hist = train(hp, model, cross_entropy_loss, data,
                        backend_conf=BackendConfig())
    # dispatches 1,2 sync individually; 3 hits k; 4-5 queue; 6 is the end
    assert len(hist["throughput_img_s"]) == 4
    assert int(state.step) == hist["steps"] > 0
    # identical math to the sync-every-group run (timing only)
    state_ref, hist_ref = train(dict(base, epochs=6), model,
                                cross_entropy_loss, data,
                                backend_conf=BackendConfig())
    assert len(hist_ref["throughput_img_s"]) == 6
    np.testing.assert_allclose(hist["train"][-1]["main_loss"],
                               hist_ref["train"][-1]["main_loss"],
                               rtol=1e-5, atol=1e-6)


def test_grad_accumulation_and_remat(tiny_setup, tmp_path):
    """grad_accumulation_steps wraps the optimizer in optax.MultiSteps
    (params update every k micro-steps); remat=True recomputes the forward in
    the backward pass and must not change the math at all."""
    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    # remat is a memory/FLOP trade, not a math change: identical trajectories
    # (single-device: 8-way GSPMD on this 1-core box costs ~3x for no coverage)
    be1 = BackendConfig(n_devices=1)
    _, h_plain = train(dict(hp), model, cross_entropy_loss, data,
                       backend_conf=be1)
    _, h_remat = train(dict(hp, remat=True), model, cross_entropy_loss, data,
                       backend_conf=be1)
    np.testing.assert_allclose(
        [r["main_loss"] for r in h_remat["train"]],
        [r["main_loss"] for r in h_plain["train"]], rtol=1e-6)
    # remat='dots' (keep matmul outputs, recompute the elementwise tail) is
    # equally math-free; unknown policies fail loudly
    _, h_dots = train(dict(hp, remat="dots"), model, cross_entropy_loss,
                      data, backend_conf=be1)
    np.testing.assert_allclose(
        [r["main_loss"] for r in h_dots["train"]],
        [r["main_loss"] for r in h_plain["train"]], rtol=1e-6)
    with pytest.raises(ValueError, match="remat"):
        train(dict(hp, remat="everything"), model, cross_entropy_loss, data,
              backend_conf=be1)
    # accumulation: same number of train steps, 1/k as many optimizer updates
    state, h_acc = train(dict(hp, grad_accumulation_steps=2), model,
                         cross_entropy_loss, data, backend_conf=be1)
    assert h_acc["steps"] == h_plain["steps"]
    assert int(state.opt_state.gradient_step) == h_acc["steps"] // 2
    assert np.isfinite([r["main_loss"] for r in h_acc["train"]]).all()


def test_mixup_cutmix_training(tiny_setup, tmp_path):
    """mixup_alpha / cutmix_alpha gate the batch-mixing regularizers inside
    the jitted step: losses stay finite, the trajectory DIFFERS from the
    unmixed run (the mixing actually engaged), and both-set picks per step
    without error (lax.cond path)."""
    model, data = tiny_setup
    init_vars = model.init(jax.random.PRNGKey(12))
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 21}
    be1 = BackendConfig(n_devices=1)
    _, h_plain = train(dict(hp), model, cross_entropy_loss, data,
                       backend_conf=be1, init_variables=init_vars)
    for mix in ({"mixup_alpha": 0.4}, {"cutmix_alpha": 1.0},
                {"mixup_alpha": 0.4, "cutmix_alpha": 1.0}):
        _, h_mix = train(dict(hp, **mix), model, cross_entropy_loss, data,
                         backend_conf=be1, init_variables=init_vars)
        mixed = [r["main_loss"] for r in h_mix["train"]]
        assert np.isfinite(mixed).all()
        assert mixed != [r["main_loss"] for r in h_plain["train"]], mix


def test_ema_respects_grad_accumulation(tiny_setup, tmp_path):
    """Under grad_accumulation_steps=k the EMA moves only on REAL optimizer
    updates (MultiSteps boundaries), not per micro-step — decay=0 must track
    the live params exactly whenever the final step completed an update."""
    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 17,
          "ema_decay": 0.0, "grad_accumulation_steps": 2}
    st, h = train(hp, model, cross_entropy_loss, data,
                  backend_conf=BackendConfig(n_devices=1))
    assert h["steps"] % 2 == 0   # final step IS an update boundary
    jax.tree_util.tree_map(
        lambda e, p: np.testing.assert_allclose(e, p, rtol=1e-6),
        st.ema_params, st.params)


def test_mixing_refuses_augmix_jsd(tiny_setup, tmp_path):
    """mixup/cutmix + augmix_jsd is an incoherent objective (mixed-batch JSD
    anchor vs clean-input views): refused loudly, not silently corrupted."""
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "output_path": str(tmp_path), "seed": 1,
          "mixup_alpha": 0.4, "augmix_jsd": {"views": 2}}
    with pytest.raises(ValueError, match="augmix_jsd"):
        train(hp, model, cross_entropy_loss, data,
              backend_conf=BackendConfig(n_devices=1))


def test_gradient_clip_norm(tiny_setup, tmp_path):
    """hp['gradient_clip_norm'] caps the global grad L2 norm before the
    optimizer (torch clip_grad_norm_ placement): a tiny cap with SGD freezes
    the params to within the cap*lr*steps ball; a huge cap is a no-op
    (bit-identical trajectory to unclipped)."""
    model, data = tiny_setup
    init_vars = model.init(jax.random.PRNGKey(4))
    hp = {"epochs": 1, "batch_size": 64, "optimizer": "sgd",
          "optimizer_opts": {"lr": 1.0}, "save_every_iters": 0,
          "log_progress_every_iters": 1, "output_path": str(tmp_path),
          "seed": 9}
    be1 = BackendConfig(n_devices=1)
    st_tiny, _ = train(dict(hp, gradient_clip_norm=1e-6), model,
                       cross_entropy_loss, data, backend_conf=be1,
                       init_variables=init_vars)
    moved = max(float(jnp.abs(d).max()) for d in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: a - b, st_tiny.params,
                               init_vars["params"])))
    assert moved < 1e-4, moved

    st_free, h_free = train(dict(hp), model, cross_entropy_loss, data,
                            backend_conf=be1, init_variables=init_vars)
    st_big, h_big = train(dict(hp, gradient_clip_norm=1e9), model,
                          cross_entropy_loss, data, backend_conf=be1,
                          init_variables=init_vars)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        st_free.params, st_big.params)


def test_ema_weight_averaging(tiny_setup, tmp_path):
    """hp['ema_decay'] maintains an EMA shadow of the params inside the
    donated TrainState: decay=0 tracks the live params exactly, decay=1
    freezes the init weights, and validation runs on the EMA weights when
    ema_eval is set (production-serving staple beyond the reference)."""
    model, data = tiny_setup
    init_vars = model.init(jax.random.PRNGKey(99))
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    be1 = BackendConfig(n_devices=1)

    # decay=0: ema == live params after every update
    st0, _ = train(dict(hp, ema_decay=0.0), model, cross_entropy_loss, data,
                   backend_conf=be1, init_variables=init_vars)
    jax.tree_util.tree_map(
        lambda e, p: np.testing.assert_allclose(e, p, rtol=1e-6),
        st0.ema_params, st0.params)

    # decay=1: ema stays at the init weights while live params move
    st1, h1 = train(dict(hp, ema_decay=1.0), model, cross_entropy_loss, data,
                    backend_conf=be1, init_variables=init_vars)
    jax.tree_util.tree_map(
        lambda e, p0: np.testing.assert_allclose(e, p0, rtol=1e-6),
        st1.ema_params, init_vars["params"])
    moved = jax.tree_util.tree_reduce(
        lambda acc, d: acc + float(jnp.abs(d).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, st1.params,
                               init_vars["params"]), 0.0)
    assert moved > 1e-3
    # ema_eval=True (default): validation metrics come from the frozen init
    # weights, not the trained ones — so they differ from a no-EMA run
    _, h_live = train(dict(hp), model, cross_entropy_loss, data,
                      backend_conf=be1, init_variables=init_vars)
    assert (h1["valid"][-1]["valid_main_loss"]
            != pytest.approx(h_live["valid"][-1]["valid_main_loss"], rel=1e-6))

    # ema state round-trips through TrainState.variables(ema=True)
    v = st1.variables(ema=True)
    assert v["params"] is st1.ema_params

    # intermediate decay: ema is neither init nor live
    st, _ = train(dict(hp, ema_decay=0.9), model, cross_entropy_loss, data,
                  backend_conf=be1, init_variables=init_vars)
    leaf_e = jax.tree_util.tree_leaves(st.ema_params)[0]
    leaf_p = jax.tree_util.tree_leaves(st.params)[0]
    leaf_0 = jax.tree_util.tree_leaves(init_vars["params"])[0]
    assert not np.allclose(leaf_e, leaf_p) and not np.allclose(leaf_e, leaf_0)


def test_crash_and_resume(tiny_setup, tmp_path):
    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 2, "output_path": str(tmp_path), "seed": 3,
          "crash_iteration": 3, "device_resident_dataset": False}
    be1 = BackendConfig(n_devices=1)
    with pytest.raises(CrashIteration):
        train(hp, model, cross_entropy_loss, data, backend_conf=be1)
    ckpt_dir = sorted(glob.glob(str(tmp_path / "run_*" / "checkpoints")))[-1]
    hp2 = dict(hp, crash_iteration=-1, resume_from=ckpt_dir)
    state, hist = train(hp2, model, cross_entropy_loss, data,
                        backend_conf=be1)
    assert hist["steps"] == 6  # resumed from step 2's epoch and completed


def test_preemption_checkpoint_and_resume(tiny_setup, tmp_path):
    """SIGTERM-equivalent preemption: the loop checkpoints at the next step
    boundary, raises Preempted, and a resumed run finishes bit-identical to
    an uninterrupted one."""
    from deepcv_tpu.train.training import Preempted, request_preemption

    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 100,  # periodic cadence never reached
          "output_path": str(tmp_path / "pre"), "seed": 3,
          "device_resident_dataset": False}
    be1 = BackendConfig(n_devices=1)

    from deepcv_tpu.train.training import TrainingEvents
    ev = TrainingEvents()
    seen = []

    @ev.on(TrainingEvents.ITERATION_COMPLETED)
    def _preempt_at_3(**_):
        seen.append(1)
        if len(seen) == 3:
            request_preemption()

    with pytest.raises(Preempted):
        train(hp, model, cross_entropy_loss, data, backend_conf=be1, events=ev)

    ckpt_dir = sorted(glob.glob(str(tmp_path / "pre" / "run_*" / "checkpoints")))[-1]
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step == 3  # preemption save, not a periodic one
    mgr.close()
    state, hist = train(dict(hp, resume_from=ckpt_dir), model,
                        cross_entropy_loss, data, backend_conf=be1)
    assert hist["steps"] == 6

    ref_state, ref_hist = train(dict(hp, output_path=str(tmp_path / "ref")),
                                model, cross_entropy_loss, data,
                                backend_conf=be1)
    assert ref_hist["steps"] == 6
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preemption_real_sigterm_and_no_retry(tiny_setup, tmp_path):
    """A real SIGTERM trips the installed handler, and train_with_retries
    refuses to retry a Preempted stop (the host is being evicted)."""
    import os
    import signal as _signal
    from deepcv_tpu.train.training import (Preempted, TrainingEvents,
                                           train_with_retries)

    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 100, "output_path": str(tmp_path), "seed": 3,
          "device_resident_dataset": False}
    prev = _signal.getsignal(_signal.SIGTERM)
    ev = TrainingEvents()
    seen = []

    @ev.on(TrainingEvents.ITERATION_COMPLETED)
    def _sigterm_at_2(**_):
        seen.append(1)
        if len(seen) == 2:
            os.kill(os.getpid(), _signal.SIGTERM)

    with pytest.raises(Preempted):
        train_with_retries(hp, model, cross_entropy_loss, data, max_retries=2,
                           backend_conf=BackendConfig(n_devices=1), events=ev)
    # handler restored, checkpoint written by the preemption path
    assert _signal.getsignal(_signal.SIGTERM) is prev
    assert glob.glob(str(tmp_path / "run_*" / "checkpoints" / "steps" / "*"))


def test_checkpoint_best_k(tmp_path):
    mgr = CheckpointManager(tmp_path, save_every_iters=10, best_k=2)
    state = {"w": np.ones((2,), np.float32)}
    assert mgr.update_best(1, 0.5, state)
    assert mgr.update_best(2, 0.7, state)
    assert mgr.update_best(3, 0.6, state)      # evicts 0.5
    assert not mgr.update_best(4, 0.4, state)  # worse than kept
    kept = mgr.best_checkpoints()
    assert sorted(kept.values()) == [0.6, 0.7]
    best = mgr.restore_best({"w": np.zeros((2,), np.float32)})
    assert np.allclose(best["w"], 1.0)
    mgr.close()


def test_metric_accumulator():
    acc = MetricAccumulator()
    acc.update({"a": jnp.asarray(1.0)}, weight=1)
    acc.update({"a": jnp.asarray(3.0)}, weight=1)
    assert acc.compute() == {"a": 2.0}
    acc.reset()
    assert acc.compute() == {}


def test_exact_epoch_sampling_visits_each_sample_once(tmp_path):
    """Resident default sampling='epoch': within one epoch every train sample
    is visited exactly once (reference DataLoader semantics); the opt-in
    with-replacement mode does not have that property."""
    from deepcv_tpu.data.datasets import ArrayDataset

    n, bs = 192, 64
    images = np.random.default_rng(0).integers(
        0, 255, (n, 8, 8, 3), dtype=np.uint8).astype(np.uint8)
    ids = np.arange(n, dtype=np.int32)  # unique per-sample IDs as 'targets'
    data = {"trainset": ArrayDataset(images, ids)}

    model = DeepcvModule((8, 8, 3), load_yaml(MODEL_YML))
    target_sum = lambda logits, y: jnp.sum(y).astype(jnp.float32)
    hp = {"epochs": 2, "batch_size": bs, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "validate_every_epochs": 10,  # no validation: pure train path
          "output_path": str(tmp_path), "seed": 11}
    _, hist = train(hp, model, cross_entropy_loss, data,
                    backend_conf=BackendConfig(n_devices=1),
                    metrics={"target_sum": target_sum})
    spe = n // bs
    per_epoch = [sum(r["target_sum"] for r in hist["train"][e * spe:(e + 1) * spe])
                 for e in range(2)]
    expected = float(ids.sum())
    # exact-epoch: the IDs seen in each epoch sum to the full-dataset sum
    assert np.allclose(per_epoch, expected), (per_epoch, expected)

    _, hist_wr = train(dict(hp, sampling="with_replacement", seed=12), model,
                       cross_entropy_loss, data,
                       backend_conf=BackendConfig(n_devices=1),
                       metrics={"target_sum": target_sum})
    wr_epoch0 = sum(r["target_sum"] for r in hist_wr["train"][:spe])
    assert not np.isclose(wr_epoch0, expected)


@pytest.mark.parametrize("n_dev", [1, 8])
def test_validation_metrics_exact_on_odd_validset(tiny_setup, tmp_path, n_dev):
    """The last eval batch is wrap-padded to keep shapes static; metrics must
    still equal the hand-computed value over the UNIQUE samples, for both a
    1-device and the full 8-device mesh."""
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 8, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "eval_batch_multiplier": 6,  # eval_bs=48 < 51
          "output_path": str(tmp_path), "seed": 5}
    be = BackendConfig(n_devices=n_dev)
    state, hist = train(hp, model, cross_entropy_loss, data, backend_conf=be)
    validset = data["validset"]
    raw_x = validset.dataset.images
    y = validset.dataset.targets
    assert len(y) == 51  # odd size: 48 + 3-sample tail in a 48-wide batch
    x = validset.batch_transform(jnp.asarray(raw_x), augment=False)
    logits = model.apply(state.variables(), x, train=False)
    expected = float(np.mean(np.argmax(np.asarray(logits), -1) == np.asarray(y)))
    assert np.isclose(hist["valid"][-1]["valid_accuracy"], expected, atol=1e-6), \
        (hist["valid"][-1]["valid_accuracy"], expected)


def test_retries_reraise_original_before_first_save(tiny_setup, tmp_path):
    """A crash before the first periodic save must re-raise the ORIGINAL
    exception (no FileNotFoundError masking, no burned retries)."""
    from deepcv_tpu.train.training import train_with_retries
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 1000,  # crash happens before any save
          "output_path": str(tmp_path), "seed": 3, "crash_iteration": 1,
          "device_resident_dataset": False}
    with pytest.raises(CrashIteration):
        train_with_retries(hp, model, cross_entropy_loss, data, max_retries=2)


def test_retries_scoped_to_own_run_dir(tiny_setup, tmp_path):
    """train_with_retries resumes from the run directory IT created, even when
    a foreign run_* directory with a lexicographically-later checkpoint exists
    under the same output_path."""
    from deepcv_tpu.train.training import train_with_retries
    model, data = tiny_setup
    # decoy: a foreign run dir that a naive glob would pick up
    decoy = tmp_path / "run_zzzz" / "checkpoints" / "steps"
    decoy.mkdir(parents=True)
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 2, "output_path": str(tmp_path), "seed": 3,
          "crash_iteration": 3, "device_resident_dataset": False}
    state, hist = train_with_retries(hp, model, cross_entropy_loss, data,
                                     max_retries=1)
    assert hist["steps"] == 6
    assert "run_zzzz" not in hist["output_path"]


def test_backend_multislice_mesh():
    """slices=k orders devices slice-major so TP ('model') groups never
    straddle a slice boundary (TP collectives must ride ICI, not DCN); only
    the data axis spans slices."""
    be = BackendConfig(slices=2, tensor_parallel=2)
    assert dict(be.mesh.shape) == {"data": 4, "model": 2}
    assert "2slices" in str(be)
    ids = np.vectorize(lambda d: d.id)(be.mesh.devices)   # (data, model)
    per_slice = 8 // 2
    for row in ids:                     # each TP group: one simulated slice
        assert len({int(i) // per_slice for i in row}) == 1
    # the data axis DOES cross slices (coarse DP allreduce over DCN is fine)
    assert len({int(i) // per_slice for i in ids[:, 0]}) == 2
    with pytest.raises(ValueError, match="does not divide"):
        BackendConfig(slices=3)
    with pytest.raises(ValueError, match="slice boundary"):
        BackendConfig(slices=4, tensor_parallel=4)


def test_train_multislice(tiny_setup, tmp_path):
    """Training over a simulated 2-slice mesh: same math, slice-aware layout."""
    model, data = tiny_setup
    hp = {"epochs": 1, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    _, hist = train(hp, model, cross_entropy_loss, data,
                    backend_conf=BackendConfig(slices=2))
    _, hist_1 = train(hp, model, cross_entropy_loss, data,
                      backend_conf=BackendConfig(n_devices=1))
    np.testing.assert_allclose(hist["train"][-1]["main_loss"],
                               hist_1["train"][-1]["main_loss"],
                               rtol=1e-4, atol=1e-5)


def test_golden_loss_trajectory(tmp_path):
    """Cross-round numeric regression guard: a fixed tiny training run must
    reproduce this exact loss trajectory (CPU mesh, single device, fixed
    seeds). A drift here means a silent change to init, data order, RNG
    plumbing, or step math — investigate before updating the goldens."""
    raw = load_dataset("synthetic", n=128, image_shape=(8, 8, 3),
                       num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    m = DeepcvModule((8, 8, 3), load_yaml(
        "act_fn: relu\nbatch_norm: { momentum: 0.1 }\narchitecture:\n"
        "  - conv2d: {kernel_size: [3,3], out_channels: 8, padding: 1}\n"
        "  - flatten: {}\n"
        "  - fully_connected: {act_fn: null, out_features: 4, batch_norm: null}"))
    hp = {"epochs": 2, "batch_size": 32, "optimizer_opts": {"lr": 1e-2},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 42}
    _, hist = train(hp, m, "cross_entropy", data,
                    backend_conf=BackendConfig(n_devices=1))
    # regenerated round 3: BatchNorm moved to verified torch semantics
    # (unbiased running var, uniform[0,1) gamma init) and conv kernels to
    # xavier NORMAL (reference base_module.py:247-249) — both change the
    # numerics deliberately (see tests/test_torch_parity.py)
    golden = [1.496227, 1.536258, 1.505743, 1.081149, 1.10801, 0.959349]
    np.testing.assert_allclose([r["main_loss"] for r in hist["train"]],
                               golden, rtol=2e-4)
    assert np.isclose(hist["valid"][-1]["valid_accuracy"], 0.3125, atol=1e-6)


def test_staged_streaming_matches_per_batch(tiny_setup, tmp_path):
    """stream_scan_batches groups k batches into one scanned dispatch; the
    grouping preserves step count, data order, and training dynamics. The
    two runs compile DIFFERENT XLA programs (scan vs per-step), so float
    rounding differs at ~1e-3 after two epochs of amplification — assert
    trajectory-level agreement, not bit equality."""
    model, data = tiny_setup
    base = {"epochs": 2, "batch_size": 32, "optimizer_opts": {"lr": 3e-3},
            "save_every_iters": 0, "log_progress_every_iters": 1000,
            "device_resident_dataset": False,   # force streaming
            "output_path": str(tmp_path), "seed": 9,
            "backend_conf": {"n_devices": 1}}
    _, h1 = train(dict(base, stream_scan_batches=1), model,
                  cross_entropy_loss, data)
    _, h4 = train(dict(base, stream_scan_batches=4), model,
                  cross_entropy_loss, data)
    assert h1["steps"] == h4["steps"]
    np.testing.assert_allclose(h1["valid"][-1]["valid_main_loss"],
                               h4["valid"][-1]["valid_main_loss"],
                               rtol=2e-2)
    np.testing.assert_allclose(h1["valid"][-1]["valid_accuracy"],
                               h4["valid"][-1]["valid_accuracy"], atol=0.06)


def test_weight_standardized_variant_trains_comparably(tmp_path):
    """The throughput-optimal norm-free + weight_norm config (zoo
    wide_classifier_ws_model pattern; 53.9% vs 38.5% MFU on v5e) must remain
    TRAINABLE: on a seeded learnable task it reaches accuracy within a
    documented margin of the batch-norm build (docs/design.md 5.9 records
    0.92 vs 0.88 on this task)."""
    from deepcv_tpu.data.datasets import ArrayDataset
    from deepcv_tpu.data.preprocess import preprocess

    rng = np.random.default_rng(3)
    protos = rng.normal(size=(4, 8, 8, 3))
    yc = rng.integers(0, 4, 512)
    x = np.clip(protos[yc] * 12 + 128 + rng.normal(scale=50, size=(512, 8, 8, 3)),
                0, 255).astype(np.uint8)
    raw = ArrayDataset(x, yc.astype(np.int32), classes=list("abcd"),
                       name="protos", provenance="synthetic")
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})

    def run(extra):
        m = DeepcvModule((8, 8, 3), load_yaml(
            "act_fn: relu\n" + extra + "architecture:\n"
            "  - conv2d: {kernel_size: [3,3], out_channels: 16, padding: 1}\n"
            "  - conv2d: {kernel_size: [3,3], out_channels: 16, padding: 1}\n"
            "  - flatten: {}\n"
            "  - fully_connected: {act_fn: null, out_features: 4,"
            " batch_norm: null}"))
        hp = {"epochs": 8, "batch_size": 32, "optimizer_opts": {"lr": 3e-3},
              "save_every_iters": 0, "log_progress_every_iters": 12,
              "validate_every_epochs": 8, "output_path": str(tmp_path),
              "seed": 11}
        _, h = train(hp, m, "cross_entropy", data,
                     backend_conf=BackendConfig(n_devices=1))
        return h["valid"][-1]["valid_accuracy"]

    acc_bn = run("batch_norm: { momentum: 0.1 }\n")
    acc_ws = run("weight_norm: { eps: 1.0e-06 }\n")
    assert acc_bn > 0.7                      # the task is learnable
    assert acc_ws > acc_bn - 0.08, (acc_bn, acc_ws)


def test_zero1_optimizer_state_sharding(tiny_setup, tmp_path):
    """ZeRO-1 (BackendConfig(zero=True)): optimizer moments sharded over
    the 'data' axis on dim 0 — layout only, so the trajectory matches the
    single-device run exactly; params stay replicated."""
    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1,
          "output_path": str(tmp_path), "seed": 7}
    be = BackendConfig(zero=True)
    assert be.zero and dict(be.mesh.shape) == {"data": 8}
    state, hist = train(dict(hp), model, cross_entropy_loss, data,
                        backend_conf=be)
    # moments are data-sharded, params replicated (the jit out_shardings
    # pin — GSPMD would otherwise propagate the moment sharding into params)
    opt_specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda l: str(getattr(l.sharding, "spec", "")), state.opt_state))
    assert any("'data'" in s for s in opt_specs), opt_specs
    par_specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda l: str(getattr(l.sharding, "spec", "")), state.params))
    for s in par_specs:
        assert "'data'" not in s, s
    state_dp, hist_dp = train(dict(hp), model, cross_entropy_loss, data,
                              backend_conf=BackendConfig(n_devices=1))
    np.testing.assert_allclose(hist["train"][-1]["main_loss"],
                               hist_dp["train"][-1]["main_loss"],
                               rtol=1e-4, atol=1e-5)


def test_schedule_free_adamw(tiny_setup, tmp_path):
    """schedule_free_adamw (arXiv:2405.15682): trains without a schedule,
    validation and the served bundle use the AVERAGED iterate (different
    tree from the raw gradient-point params), and combining it with an LR
    scheduler is rejected loudly."""
    from deepcv_tpu.train.training import build_optimizer

    model, data = tiny_setup
    hp = {"epochs": 2, "batch_size": 64, "optimizer": "schedule_free_adamw",
          "optimizer_opts": {"lr": 3e-3, "warmup_steps": 2},
          # clipping wraps the opt_state in an optax.chain tuple: the sf
          # eval path must find the ScheduleFreeState inside the nesting
          "gradient_clip_norm": 1.0,
          "scheduler": None, "save_every_iters": 0,
          "log_progress_every_iters": 1, "validate_every_epochs": 1,
          "output_path": str(tmp_path), "seed": 7}
    state, hist = train(dict(hp), model, cross_entropy_loss, data,
                        backend_conf=BackendConfig(n_devices=1))
    assert hist["train"][-1]["main_loss"] < hist["train"][0]["main_loss"]
    assert hist["valid"]  # validation executed through the sf eval path
    # the serving slot holds the averaged iterate, distinct from raw params
    assert state.ema_params is not None
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state.ema_params)
    assert any(d > 0 for d in jax.tree_util.tree_leaves(diffs))

    with pytest.raises(ValueError, match="scheduler"):
        build_optimizer("schedule_free_adamw", {"lr": 1e-3},
                        schedule=lambda s: 1e-3)

    # ema_decay would average the RAW gradient-point iterates — rejected
    with pytest.raises(ValueError, match="ema_decay"):
        train(dict(hp, ema_decay=0.99), model, cross_entropy_loss, data,
              backend_conf=BackendConfig(n_devices=1))

    # dotted/cased spellings normalize like build_optimizer's, so the sf
    # eval path still engages (averaged iterate parked for serving)
    hp2 = dict(hp, optimizer="optax.contrib.Schedule_Free_AdamW", epochs=1,
               validate_every_epochs=1000)
    state2, _ = train(hp2, model, cross_entropy_loss, data,
                      backend_conf=BackendConfig(n_devices=1))
    assert state2.ema_params is not None


def test_zero1_composes_with_modern_optimizer_states(tiny_setup, tmp_path):
    """ZeRO-1's rule is tree-generic (any opt_state leaf with a divisible
    dim 0), not Adam-specific: muon's momentum matrices and adafactor's
    factored row/col vectors shard over 'data' too, and the loss still
    decreases through the 8-device mesh."""
    model, data = tiny_setup
    for opt, lr in (("muon", 3e-3), ("adafactor", 1e-2)):
        hp = {"epochs": 2, "batch_size": 64, "optimizer": opt,
              "optimizer_opts": {"lr": lr}, "save_every_iters": 0,
              "log_progress_every_iters": 1,
              "output_path": str(tmp_path / opt), "seed": 7}
        state, hist = train(dict(hp), model, cross_entropy_loss, data,
                            backend_conf=BackendConfig(zero=True))
        opt_specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda l: str(getattr(l.sharding, "spec", "")), state.opt_state))
        assert any("'data'" in s for s in opt_specs), (opt, opt_specs)
        assert (hist["train"][-1]["main_loss"]
                < hist["train"][0]["main_loss"]), opt


def test_large_batch_optimizers(tiny_setup, tmp_path):
    """LAMB and LARS (the large-batch TPU staples) train through the
    standard loop and decrease the loss; unknown names list them."""
    from deepcv_tpu.train.training import build_optimizer

    model, data = tiny_setup
    for opt in ("lamb", "lars"):
        hp = {"epochs": 2, "batch_size": 64, "optimizer": opt,
              "optimizer_opts": {"lr": 1e-2, "weight_decay": 1e-4},
              "save_every_iters": 0, "log_progress_every_iters": 1,
              "output_path": str(tmp_path / opt), "seed": 7,
              "backend_conf": {"n_devices": 1}}
        state, hist = train(dict(hp), model, cross_entropy_loss, data)
        assert hist["train"][-1]["main_loss"] < hist["train"][0]["main_loss"], opt
    with pytest.raises(ValueError, match="lamb, lars"):
        build_optimizer("adagrad", {"lr": 1e-3})


def test_flat_params_matches_tree_storage(tmp_path):
    """hp flat_params (born-flat param+stat buffers, r4 verdict #3): the
    loss trajectory and validation metrics must be IDENTICAL to tree
    storage — the layout is a performance experiment, never semantics.
    (Measured post-mortem on ResNet-50: docs/design.md §5.17.)"""
    import numpy as np

    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.spec import DeepcvModule

    raw = load_dataset("synthetic", n=128, image_shape=(8, 8, 3),
                       num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.1},
                       "transforms": ["to_tensor"]})
    mhp = {"act_fn": "relu", "batch_norm": {"momentum": 0.1},
           "architecture": [
               {"conv2d": {"kernel_size": [3, 3], "out_channels": 8,
                           "padding": 1}},
               {"flatten": {}},
               {"fully_connected": {"out_features": 4, "act_fn": None,
                                    "batch_norm": None}}]}
    base = {"epochs": 2, "batch_size": 32, "optimizer": "sgd",
            "optimizer_opts": {"lr": 1e-2, "momentum": 0.9},
            "save_every_iters": 0, "log_progress_every_iters": 2,
            "validate_every_epochs": 2, "seed": 0,
            "output_path": str(tmp_path), "handle_preemption": False}

    def run(flat):
        m = DeepcvModule((8, 8, 3), mhp)
        _, h = train({**base, "flat_params": flat}, m, "cross_entropy", data)
        return ([e["cross_entropy"] for e in h["train"]], h["valid"][-1])

    (lt, vt), (lf, vf) = run(False), run(True)
    np.testing.assert_allclose(lt, lf, rtol=2e-5, atol=1e-7)
    for k in vt:
        np.testing.assert_allclose(vt[k], vf[k], rtol=2e-5, atol=1e-7)


def test_flat_params_rejects_per_tensor_sharding_modes(tmp_path):
    """flat_params + ZeRO/TP or path-based masks must be a loud, typed
    refusal — their rules are per-tensor and would silently no-op."""
    import pytest as _pytest

    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train.backend import BackendConfig

    raw = load_dataset("synthetic", n=64, image_shape=(8, 8, 3),
                       num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.1},
                       "transforms": ["to_tensor"]})
    mhp = {"act_fn": "relu", "architecture": [
        {"flatten": {}},
        {"fully_connected": {"out_features": 4, "act_fn": None,
                             "batch_norm": None}}]}
    m = DeepcvModule((8, 8, 3), mhp)
    hp = {"epochs": 1, "batch_size": 32, "optimizer_opts": {"lr": 1e-2},
          "save_every_iters": 0, "log_progress_every_iters": 100,
          "seed": 0, "output_path": str(tmp_path), "flat_params": True,
          "handle_preemption": False}
    with _pytest.raises(ValueError, match="flat_params"):
        train(hp, m, "cross_entropy", data,
              backend_conf=BackendConfig(zero=True))
    with _pytest.raises(ValueError, match="flat_params"):
        train({**hp, "freeze_params": "conv"}, m, "cross_entropy", data)
