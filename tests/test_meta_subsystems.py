"""Training metadata, LR finder, viz, parallel helpers, flow net."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.data.training_metadata import (
    TrainingMetaData, DatasetStats, Task, Experiment, MetaTracker,
)
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.viz import to_uint8, make_grid, save_image_grid
from deepcv_tpu.parallel import (
    make_mesh, tensor_parallel_rules, shard_params, spatial_sharding,
    pipeline_parallel_apply, data_parallelism_usefulness_heuristic,
)
from deepcv_tpu.train.lr_finder import (
    run_lr_range_test, find_optimal_params, plot_search_curves,
)
from deepcv_tpu.pipelines.video import SimpleFlowNet, flow_warp
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.config import load_yaml
from jax.sharding import PartitionSpec as P


def test_metadata_records_and_tracker(tmp_path):
    ds = load_dataset("synthetic", n=64, image_shape=(8, 8, 3), num_classes=4)
    stats = DatasetStats.from_dataset(ds)
    assert stats.n_samples == 64 and stats.num_classes == 4 and stats.uuid
    tracker = MetaTracker(tmp_path)
    for cap, n, acc in [(1e4, 100, 0.5), (1e5, 100, 0.6), (1e5, 1000, 0.7)]:
        tracker.store(Experiment(task=Task(dataset_stats=stats),
                                 model_capacity=int(cap), trainset_size=n,
                                 final_metrics={"valid_accuracy": acc}))
    rows = tracker.scaling_triplets()
    assert len(rows) == 3 and rows[0]["val_error"] == 0.5
    assert len(tracker.load_all()) == 3
    tracker.reset()
    assert tracker.load_all() == []


def test_experiment_from_training():
    ds = load_dataset("synthetic", n=64, image_shape=(8, 8, 3), num_classes=4)
    m = DeepcvModule((8, 8, 3), load_yaml(
        "act_fn: relu\narchitecture:\n  - flatten: {}\n"
        "  - fully_connected: {out_features: 4}"))
    hist = {"valid": [{"epoch": 1, "valid_accuracy": 0.8}], "steps": 10,
            "total_time_s": 1.5}
    exp = MetaTracker.experiment_from_training(m, {"epochs": 1}, hist, ds)
    assert exp.model_capacity > 0 and exp.final_metrics["valid_accuracy"] == 0.8
    assert exp.trainset_size == 64 and exp.steps == 10


def test_viz_grid(tmp_path):
    imgs = np.random.default_rng(0).integers(0, 256, (6, 8, 8, 3), np.uint8)
    grid = make_grid(imgs, n_cols=3)
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 3)
    p = save_image_grid(imgs, tmp_path / "grid.png", n_cols=3, labels=range(6))
    assert p.exists()
    # normalized float roundtrip
    f = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.25
    back = to_uint8(f, mean=[0.5] * 3, std=[0.25] * 3)
    assert np.abs(back.astype(int) - imgs.astype(int)).max() <= 1


def test_tensor_parallel_sharding(devices):
    mesh = make_mesh({"data": 4, "model": 2})
    params = {"dense": {"kernel": jnp.zeros((16, 8)), "bias": jnp.zeros((8,))},
              "odd": {"kernel": jnp.zeros((16, 7))}}
    rules = tensor_parallel_rules(params, mesh)
    assert rules["dense"]["kernel"] == P(None, "model")
    assert rules["dense"]["bias"] == P()
    assert rules["odd"]["kernel"] == P()  # 7 not divisible by 2
    sharded = shard_params(params, mesh)
    assert "model" in str(sharded["dense"]["kernel"].sharding)
    # sharded matmul executes
    x = jnp.ones((8, 16))
    y = jax.jit(lambda p, x: x @ p["dense"]["kernel"])(sharded, x)
    assert y.shape == (8, 8)
    with pytest.raises(ValueError, match="devices"):
        make_mesh({"data": 3})


def test_spatial_partitioning(devices):
    """SP: input sharded on H over 8 devices must give the same conv result
    as unsharded — GSPMD's automatic halo exchange at tile boundaries."""
    mesh = make_mesh({"data": 8})
    k = jax.random.normal(jax.random.PRNGKey(0), (5, 5, 3, 8), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3), jnp.float32)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = conv(x)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = jax.jit(conv)(xs)
    assert "data" in str(out.sharding.spec)  # split propagated, not gathered
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_parallel_apply(devices):
    """PP: GPipe microbatch schedule over a 4-stage mesh axis must match
    applying the stages sequentially on one device."""
    mesh = make_mesh({"stage": 4, "data": 2})
    S, F = 4, 16
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    stage_params = {
        "w": jnp.stack([jax.random.normal(k, (F, F)) * 0.3 for k in keys]),
        "b": jnp.stack([jnp.full((F,), 0.01 * i) for i in range(S)]),
    }

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    x = jax.random.normal(jax.random.PRNGKey(1), (8, F))
    ref = x
    for i in range(S):
        ref = stage_fn(jax.tree_util.tree_map(lambda v: v[i], stage_params), ref)

    out = pipeline_parallel_apply(stage_fn, stage_params, x,
                                  mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_parallel_apply(stage_fn, stage_params, x,
                                mesh=mesh, n_microbatches=3)


def test_dp_heuristic():
    assert data_parallelism_usefulness_heuristic(10_000_000, 4096, 8) > 0.8
    assert data_parallelism_usefulness_heuristic(10_000, 16, 8) < 0.3
    assert data_parallelism_usefulness_heuristic(10_000_000, 4096, 1) == 0.0


def test_lr_range_test_and_suggestion(tmp_path):
    ds = load_dataset("synthetic", n=256, image_shape=(8, 8, 3), num_classes=4)
    m = DeepcvModule((8, 8, 3), load_yaml(
        "act_fn: relu\narchitecture:\n  - conv2d: {kernel_size: [3,3], "
        "out_channels: 8, padding: 1}\n  - flatten: {}\n"
        "  - fully_connected: {out_features: 4, act_fn: null}"))
    res = run_lr_range_test(m, "cross_entropy", ds, batch_size=32,
                            min_lr=1e-6, max_lr=50.0, num_steps=60)
    assert len(res["lrs"]) <= 60 and res["best_lr"] > 0
    assert res["suggested"]["base_lr"] < res["suggested"]["max_lr"]
    # diverged before max_lr (lr 50 on this problem must explode)
    assert res["lrs"][-1] < 50.0
    out = plot_search_curves(res, tmp_path / "lr.png")
    assert out.exists()


def test_simple_flow_net_zero_motion():
    net = SimpleFlowNet(levels=2, features=8)
    # jit both phases: unjitted op-by-op dispatch costs ~15s on this 1-core
    # box, while the compiled programs land in the persistent test cache
    v = jax.jit(lambda k: net.init(k, (16, 16, 3)))(jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    flow = jax.jit(net.apply)(v, a, a)
    assert flow.shape == (2, 16, 16, 2)
    assert bool(jnp.isfinite(flow).all())


def test_module_self_test_cli_mapping():
    from deepcv_tpu.utils import test_module_cli  # importable; runs pytest
    assert callable(test_module_cli)
