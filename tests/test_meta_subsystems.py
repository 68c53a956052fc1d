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
    pipeline_parallel_apply, ring_attention,
    data_parallelism_usefulness_heuristic,
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


def test_ring_attention_matches_full_softmax(devices):
    """Ring attention over an 8-device sequence shard == the single-device
    full-softmax reference, forward AND gradients (the online-softmax merge
    across ring hops is exact, and ppermute's transpose makes the backward
    a ring too)."""
    from deepcv_tpu.ops.attention import attention_xla
    mesh = make_mesh({"data": 8})
    n, h, t, dh = 2, 3, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (n, h, t, dh), jnp.float32) for kk in ks)

    ref = attention_xla(q, k, v)
    out = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return jax.grad(lambda a, b, c: jnp.sum(jnp.tanh(fn(a, b, c))),
                        argnums=(0, 1, 2))
    g_ref = loss(attention_xla)(q, k, v)
    g_ring = jax.jit(loss(lambda *a: ring_attention(*a, mesh=mesh)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_ring_attention_rejects_bad_shapes(devices):
    mesh = make_mesh({"data": 8})
    x = jnp.zeros((2, 3, 62, 16))  # 62 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(x, x, x, mesh=mesh)
    with pytest.raises(ValueError, match="N, H, T, Dh"):
        ring_attention(x[0], x[0], x[0], mesh=mesh)


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


def test_batch_norm_axis_name_syncs_stats_under_shard_map():
    """ops.nn.BatchNorm(axis_name=...) under shard_map computes GLOBAL batch
    statistics (SyncBatchNorm, reference ignite_training.py:382-386): outputs
    and running stats match the unsharded full-batch module exactly. Pins the
    round-3 BatchNorm rewrite's collective path (pmean of mean/mean2 + psum
    device count for the Bessel correction)."""
    import numpy as np
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from deepcv_tpu.ops.nn import BatchNorm

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("data",))
    x = np.random.default_rng(0).normal(1.0, 2.5, (16, 4, 4, 6)).astype(np.float32)

    ref_bn = BatchNorm(momentum=0.1)
    v = ref_bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    use_running_average=False)
    y_ref, mut_ref = ref_bn.apply(v, jnp.asarray(x), use_running_average=False,
                                  mutable=["batch_stats"])

    sync_bn = BatchNorm(momentum=0.1, axis_name="data")

    @partial(shard_map, mesh=mesh, in_specs=(P(), P("data")),
             out_specs=(P("data"), P()))
    def fwd(variables, xs):
        y, mut = sync_bn.apply(variables, xs, use_running_average=False,
                               mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_sync, bs_sync = fwd(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_sync), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bs_sync["mean"]),
                               np.asarray(mut_ref["batch_stats"]["mean"]),
                               rtol=1e-5, atol=1e-7)
    # the Bessel correction must use the GLOBAL element count: a per-shard
    # n would inflate the running var by (n_local/(n_local-1)) instead
    np.testing.assert_allclose(np.asarray(bs_sync["var"]),
                               np.asarray(mut_ref["batch_stats"]["var"]),
                               rtol=1e-5, atol=1e-7)


def test_calibration_scales_key_by_full_path():
    """Two DIFFERENT layers sharing a local node name inside nested modules
    must get DISTINCT calibration scales (r2 verdict Weak #7: last-name
    keying silently shared one scale across nested occurrences)."""
    import jax
    import jax.numpy as jnp

    from deepcv_tpu.compression import calibrate_int8_scales
    from deepcv_tpu.config import load_yaml
    from deepcv_tpu.spec import DeepcvModule

    hp = load_yaml("""
act_fn: relu
architecture:
  - _nested_deepcvmodule:
      _name: "block_a"
      act_fn: relu
      architecture:
        - conv2d: ["c", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
  - _nested_deepcvmodule:
      _name: "block_b"
      act_fn: relu
      architecture:
        - conv2d: ["c", { kernel_size: [3, 3], out_channels: 4, padding: 1 }]
""")
    m = DeepcvModule((8, 8, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    # block_b's conv sees block_a's OUTPUT — very different input ranges
    x = 100.0 * jnp.ones((2, 8, 8, 3))
    scales = calibrate_int8_scales(m, v, [x])
    assert set(scales) == {"block_a/c", "block_b/c"}, scales
    assert scales["block_a/c"] != scales["block_b/c"]
    # the quantized rebuild resolves the per-path keys (ctx.scope threading)
    mq = m.with_options(quantize="int8", quantize_scales=scales)
    y = mq.apply(v, x, train=False)
    assert y.shape[0] == 2


def test_mfu_report_measures_a_matmul():
    """profiling.mfu_report: forced-sync timing + XLA cost analysis. On CPU
    the peak table has no entry so mfu is None, but flops and throughput
    must be real (a 256^3 matmul is ~33.6 MFLOP)."""
    import jax
    import jax.numpy as jnp
    from deepcv_tpu.profiling import mfu_report

    a = jnp.ones((256, 256), jnp.float32)
    rep = mfu_report(lambda x: x @ x, a, n=3)
    assert rep["seconds"] > 0
    assert 0.9 * 2 * 256**3 <= rep["flops"] <= 3 * 2 * 256**3
    assert rep["mfu"] is None or 0 < rep["mfu"] < 1.5
    assert rep["tflops_per_s"] > 0


def test_model_flops_static_profile():
    """profiling.model_flops: AOT cost analysis, no execution. The conv
    FLOPs of a known tiny model bound the reported number from below."""
    from deepcv_tpu.config import load_yaml
    from deepcv_tpu.profiling import model_flops
    from deepcv_tpu.spec import DeepcvModule

    m = DeepcvModule((8, 8, 3), load_yaml("""
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null }
"""))
    rep = model_flops(m, batch_size=4)
    # first-conv input channels are lane-padded 3 -> 8 (pad_channels_for_tpu)
    conv_params = 3 * 3 * 8 * 16 + 16
    fc_params = 8 * 8 * 16 * 10 + 10
    assert rep["params"] == conv_params + fc_params
    # dot/conv flops >= 2*MACs of conv + fc (XLA may add elementwise work)
    macs = 8 * 8 * 3 * 3 * 3 * 16 + 8 * 8 * 16 * 10
    assert rep["flops"] >= 2 * macs * 4 * 0.9
    assert rep["flops_per_image"] * 4 == rep["flops"]
    assert rep["batch_size"] == 4
