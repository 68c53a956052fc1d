"""Working detection pipeline tests (reference had only a stub)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.pipelines.detection import (
    generate_shapes_dataset, detection_loss, objectness_accuracy,
    mean_iou_on_objects, decode_detections, create_detector, train_detector,
    SHAPE_CLASSES,
)
from deepcv_tpu.data.preprocess import preprocess


@pytest.fixture(scope="module")
def shapes():
    return generate_shapes_dataset(n=128, image_size=16, grid=4, seed=0)


def test_generator_targets_consistent(shapes):
    assert shapes.images.shape == (128, 16, 16, 3)
    assert shapes.targets.shape == (128, 4, 4, 5 + len(SHAPE_CLASSES))
    t = shapes.targets
    obj = t[..., 0] > 0
    assert obj.sum() >= 128  # at least one object per image
    # box fields only on object cells; offsets within [0,1); classes one-hot
    assert np.all(t[..., 1:3][obj] >= 0) and np.all(t[..., 1:3][obj] < 1)
    assert np.allclose(t[..., 5:][obj].sum(-1), 1.0)
    assert np.all(t[~obj][:, 1:].sum(-1) == 0)


def test_detection_loss_perfect_prediction_is_low(shapes):
    t = jnp.asarray(shapes.targets[:8])
    # construct logits that decode to the target: obj +-10, sigmoid-inverse boxes
    eps = 1e-4
    inv = lambda p: jnp.log(jnp.clip(p, eps, 1 - eps) / (1 - jnp.clip(p, eps, 1 - eps)))
    pred = jnp.concatenate([jnp.where(t[..., :1] > 0, 10.0, -10.0),
                            inv(t[..., 1:5]),
                            jnp.where(t[..., 5:] > 0, 10.0, -10.0)], axis=-1)
    good = float(detection_loss(pred, t))
    bad = float(detection_loss(jnp.zeros_like(pred), t))
    assert good < 0.05 < bad
    assert float(objectness_accuracy(pred, t)) == 1.0
    assert float(mean_iou_on_objects(pred, t)) > 0.95


def test_decode_detections(shapes):
    t = jnp.asarray(shapes.targets[:4])
    eps = 1e-4
    inv = lambda p: jnp.log(jnp.clip(p, eps, 1 - eps) / (1 - jnp.clip(p, eps, 1 - eps)))
    pred = jnp.concatenate([jnp.where(t[..., :1] > 0, 10.0, -10.0),
                            inv(t[..., 1:5]),
                            jnp.where(t[..., 5:] > 0, 10.0, -10.0)], axis=-1)
    boxes, scores, classes = decode_detections(pred, top_k=4)
    assert boxes.shape == (4, 4, 4) and scores.shape == (4, 4)
    # top box must be a real object with near-1 confidence and sane coords
    assert float(scores[0, 0]) > 0.99
    assert np.all(np.asarray(boxes) >= -0.3) and np.all(np.asarray(boxes) <= 1.3)


def test_detector_training_improves_iou(tmp_path):
    train_raw = generate_shapes_dataset(n=256, image_size=16, grid=4, seed=1)
    data = preprocess({"trainset": train_raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    model = create_detector(data, {
        "act_fn": "relu",
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16, "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16, "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
        ]})
    assert model.eval_output_shape() == (1, 4, 4, 5 + len(SHAPE_CLASSES))
    hp = {"epochs": 4, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "output_path": str(tmp_path), "seed": 0,
          "log_progress_every_iters": 1, "backend_conf": {"n_devices": 1}}
    out = train_detector(data, model, hp)
    h = out["history"]
    assert h["train"][-1]["main_loss"] < h["train"][0]["main_loss"]
    assert h["valid"][-1]["valid_mean_iou"] > h["valid"][0]["valid_mean_iou"] - 0.05


# --------------------------------------------------------------------------- #
# Multi-scale FPN variant
# --------------------------------------------------------------------------- #

def test_fpn_generator_level_assignment():
    from deepcv_tpu.pipelines.detection import (flat_grid_layout,
                                                generate_shapes_dataset_fpn)
    ds = generate_shapes_dataset_fpn(n=64, image_size=32, grids=(8, 4),
                                     size_bounds=(0.3,), seed=0)
    t = ds.targets
    assert t.shape == (64, 8 * 8 + 4 * 4, 5 + len(SHAPE_CLASSES))
    obj = t[..., 0] > 0
    assert obj.sum() >= 64
    # small objects (max wh <= 0.3) land on the fine level, large on coarse
    fine, coarse = t[:, :64], t[:, 64:]
    fo, co = fine[..., 0] > 0, coarse[..., 0] > 0
    assert fo.sum() > 0 and co.sum() > 0
    assert np.all(np.maximum(fine[..., 3][fo], fine[..., 4][fo]) <= 0.3 + 1e-6)
    assert np.all(np.maximum(coarse[..., 3][co], coarse[..., 4][co]) > 0.3 - 1e-6)
    gx, gy, gs = flat_grid_layout((8, 4))
    assert gx.shape == (80,) and float(gs[0]) == 8 and float(gs[-1]) == 4


def test_focal_loss_semantics():
    """Focal loss: perfect confident prediction ~ 0; focal term down-weights
    easy negatives vs plain BCE (gamma=0 == alpha-weighted BCE)."""
    from deepcv_tpu.pipelines.detection import (detection_loss_focal,
                                                generate_shapes_dataset_fpn)
    ds = generate_shapes_dataset_fpn(n=8, image_size=32, grids=(8, 4), seed=1)
    t = jnp.asarray(ds.targets)
    eps = 1e-4
    inv = lambda p: jnp.log(jnp.clip(p, eps, 1 - eps) / (1 - jnp.clip(p, eps, 1 - eps)))
    perfect = jnp.concatenate([jnp.where(t[..., :1] > 0, 12.0, -12.0),
                               inv(t[..., 1:5]),
                               jnp.where(t[..., 5:] > 0, 12.0, -12.0)], -1)
    assert float(detection_loss_focal(perfect, t)) < 0.05
    # mildly-confident easy negatives: focusing (gamma=2) shrinks their
    # contribution vs gamma=0
    mild = jnp.concatenate([jnp.where(t[..., :1] > 0, 2.0, -2.0),
                            inv(t[..., 1:5]),
                            jnp.where(t[..., 5:] > 0, 2.0, -2.0)], -1)
    assert float(detection_loss_focal(mild, t, gamma=2.0)) \
        < float(detection_loss_focal(mild, t, gamma=0.0))


def test_decode_flat_and_map50_flat_perfect():
    from deepcv_tpu.pipelines.detection import (decode_detections_flat,
                                                generate_shapes_dataset_fpn,
                                                map50_flat)
    ds = generate_shapes_dataset_fpn(n=8, image_size=32, grids=(8, 4), seed=2)
    t = jnp.asarray(ds.targets)
    eps = 1e-4
    inv = lambda p: jnp.log(jnp.clip(p, eps, 1 - eps) / (1 - jnp.clip(p, eps, 1 - eps)))
    pred = jnp.concatenate([jnp.where(t[..., :1] > 0, 10.0, -10.0),
                            inv(t[..., 1:5]),
                            jnp.where(t[..., 5:] > 0, 10.0, -10.0)], -1)
    boxes, scores, classes = decode_detections_flat(pred, (8, 4), top_k=8)
    assert boxes.shape == (8, 8, 4) and float(scores[0, 0]) > 0.99
    m = float(jax.jit(lambda p, t: map50_flat(p, t, grids=(8, 4)))(pred, t))
    assert m > 0.99  # perfect detections -> mAP 1.0


def test_fpn_detector_training_improves_map50(tmp_path):
    from deepcv_tpu.pipelines.detection import (create_fpn_detector,
                                                generate_shapes_dataset_fpn,
                                                train_fpn_detector)
    raw = generate_shapes_dataset_fpn(n=256, image_size=16, grids=(4, 2),
                                      seed=3)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    model = create_fpn_detector(data, {
        "act_fn": "relu", "fpn_channels": 32,
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16, "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": {"kernel_size": [2, 2], "out_channels": 16, "padding": 0,
                        "stride": 2, "_name": "c3"}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": ["c4", {"kernel_size": [3, 3], "out_channels": 32,
                               "padding": 1}]},
            {"_new_branch_from_tensor": {"_from": ["c3", "c4"]}},
        ]})
    assert model.eval_output_shape() == (1, 4 * 4 + 2 * 2, 5 + len(SHAPE_CLASSES))
    hp = {"epochs": 6, "batch_size": 64, "optimizer_opts": {"lr": 3e-3},
          "save_every_iters": 0, "output_path": str(tmp_path), "seed": 0,
          "fpn_grids": (4, 2), "validate_every_epochs": 2,
          "log_progress_every_iters": 1, "backend_conf": {"n_devices": 1}}
    out = train_fpn_detector(data, model, hp)
    h = out["history"]
    assert h["train"][-1]["main_loss"] < h["train"][0]["main_loss"]
    assert h["valid"][-1]["valid_map50"] > h["valid"][0]["valid_map50"] - 0.05
    assert "valid_map50" in h["valid"][0]   # eval-only metric present


def test_fpn_grids_validated_against_dataset(tmp_path):
    """fpn_grids that are reordered (same total!) or mismatched must fail
    loudly — a silent mismatch would corrupt decode/mAP with no signal."""
    from deepcv_tpu.pipelines.detection import (create_fpn_detector,
                                                generate_shapes_dataset_fpn,
                                                train_fpn_detector)
    raw = generate_shapes_dataset_fpn(n=64, image_size=16, grids=(4, 2),
                                      seed=5)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    model = create_fpn_detector(data, {
        "act_fn": "relu", "fpn_channels": 16,
        "architecture": [
            {"conv2d": ["c3", {"kernel_size": [2, 2], "out_channels": 8,
                               "padding": 0, "stride": 4}]},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": ["c4", {"kernel_size": [3, 3], "out_channels": 8,
                               "padding": 1}]},
            {"_new_branch_from_tensor": {"_from": ["c3", "c4"]}},
        ]})
    hp = {"epochs": 1, "batch_size": 16, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "output_path": str(tmp_path), "seed": 0,
          "backend_conf": {"n_devices": 1}}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fine->coarse"):
        train_fpn_detector(data, model, {**hp, "fpn_grids": (2, 4)})
    with _pytest.raises(ValueError, match="flatten to"):
        train_fpn_detector(data, model, {**hp, "fpn_grids": (8, 4)})


def test_fpn_catalog_loader_multi_level():
    """>2-level pyramids are configurable from YAML: grids + optional
    size_bounds both reach the generator (previously swallowed by **kw)."""
    from deepcv_tpu.data.datasets import load_dataset
    ds = load_dataset("synthetic_shapes_fpn", grids=[16, 8, 4], n=8,
                      image_size=32)
    assert ds.targets.shape[1] == 16 * 16 + 8 * 8 + 4 * 4
    ds2 = load_dataset("synthetic_shapes_fpn", grids=[16, 8, 4], n=8,
                       image_size=32, size_bounds=[0.2, 0.4])
    assert ds2.targets.shape[1] == ds.targets.shape[1]


def test_cli_predict_decode_detection(tmp_path):
    """Detection serving round-trip: bundle a (fresh) dense detector, run
    the predict CLI with --decode detection — output is an .npz of
    boxes/scores/classes with class-aware NMS applied (scores are
    confidences, suppressed entries exactly 0); the FPN flat layout
    decodes through --decode detection:G1,G2."""
    import json

    from deepcv_tpu.cli import main as cli_main
    from deepcv_tpu.pipelines.detection import (create_detector,
                                                create_fpn_detector)
    from deepcv_tpu.serve import save_model_bundle

    raw = generate_shapes_dataset(n=32, image_size=16, grid=4, seed=9)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})
    model = create_detector(data, {
        "act_fn": "relu",
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 8, "padding": 1}},
            {"avg_pooling": {"kernel_size": [4, 4], "stride": [4, 4]}},
        ]})
    v = model.init(jax.random.PRNGKey(0))
    bundle = tmp_path / "det_bundle"
    save_model_bundle(bundle, model, v)
    imgs = np.asarray(raw.images[:5])
    np.save(tmp_path / "in.npy", imgs)
    rc = cli_main(["predict", "--bundle", str(bundle),
                   "--input", str(tmp_path / "in.npy"),
                   "--output", str(tmp_path / "det.npy"),
                   "--batch-size", "5", "--to-tensor",
                   "--decode", "detection", "--top-k", "6"])
    assert rc == 0
    out = np.load(tmp_path / "det.npz")
    assert out["boxes"].shape == (5, 6, 4)
    assert out["scores"].shape == (5, 6) and out["classes"].shape == (5, 6)

    # FPN flat layout through --decode detection:G1,G2
    from deepcv_tpu.pipelines.detection import generate_shapes_dataset_fpn
    raw_f = generate_shapes_dataset_fpn(n=16, image_size=16, grids=(4, 2),
                                        seed=9)
    data_f = preprocess({"trainset": raw_f},
                        {"seed": 0, "split_dataset": {"validset_ratio": 0.25},
                         "transforms": ["to_tensor"]})
    model_f = create_fpn_detector(data_f, {
        "act_fn": "relu", "fpn_channels": 8,
        "architecture": [
            {"conv2d": ["c3", {"kernel_size": [2, 2], "out_channels": 8,
                               "padding": 0, "stride": 4}]},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": ["c4", {"kernel_size": [3, 3], "out_channels": 8,
                               "padding": 1}]},
            {"_new_branch_from_tensor": {"_from": ["c3", "c4"]}},
        ]})
    vf = model_f.init(jax.random.PRNGKey(0))
    bundle_f = tmp_path / "fpn_bundle"
    save_model_bundle(bundle_f, model_f, vf)
    np.save(tmp_path / "in2.npy", np.asarray(raw_f.images[:3]))
    rc = cli_main(["predict", "--bundle", str(bundle_f),
                   "--input", str(tmp_path / "in2.npy"),
                   "--output", str(tmp_path / "fpn_det.npz"),
                   "--batch-size", "3", "--to-tensor",
                   "--decode", "detection:4,2", "--top-k", "4"])
    assert rc == 0
    out = np.load(tmp_path / "fpn_det.npz")
    assert out["boxes"].shape == (3, 4, 4)
