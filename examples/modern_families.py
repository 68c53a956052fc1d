"""The round-3 model families and dense-prediction pipelines, end to end.

Run: ``python examples/modern_families.py`` (CPU-friendly shrunk sizes; on
a TPU the same code runs full-size — swap in the real variants).

Covers:
  1. ViT through the spec language (zoo builder), with the Pallas flash
     attention path cross-checked against the XLA path;
  2. ConvNeXt through the spec language (layer scale + stochastic depth)
     and Swin-T (hierarchical windowed attention);
  3. the multi-scale FPN detector (focal loss, flat decode, mAP@0.5);
  4. HRNet-style semantic segmentation (mIoU).
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.spec.zoo import convnext_spec, vit_spec


def shrink_vit(hp, blocks=2, dim=32, heads=4, mlp=64, patch=8):
    arch = hp["architecture"][:1 + blocks] + hp["architecture"][-3:]
    arch[0]["patch_embed"][1].update(patch_size=patch, embed_dim=dim)
    for row in arch[1:1 + blocks]:
        row["transformer_block"][1].update(num_heads=heads, mlp_dim=mlp)
    hp["architecture"] = arch
    return hp


def vit_with_flash():
    print("== ViT (spec-built) with flash vs XLA attention ==")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    logits = {}
    for impl in ("xla", "flash"):
        hp = shrink_vit(vit_spec(variant="b_16", num_classes=10,
                                 stochastic_depth=0.1, attn_impl=impl))
        m = DeepcvModule((32, 32, 3), hp)
        v = m.init(jax.random.PRNGKey(1))   # same seed -> same params
        logits[impl] = jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))(
            v, x)
    diff = float(jnp.max(jnp.abs(logits["xla"] - logits["flash"])))
    print(f"   max |xla - flash| on logits: {diff:.2e}")
    assert diff < 1e-4


def convnext_forward():
    print("== ConvNeXt (spec-built, 1 block/stage shrink) ==")
    hp = convnext_spec(variant="tiny", num_classes=10, pool_kernel=1,
                       stochastic_depth=0.1)
    hp["architecture"] = [r for r in hp["architecture"]
                          if "convnext_block" not in r
                          or r["convnext_block"][0].endswith("b0")]
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    y = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    print("   train-mode logits:", y.shape)


def swin_forward():
    print("== Swin-T (spec-built, windowed attention) ==")
    from deepcv_tpu.spec.zoo import swin_spec
    hp = swin_spec(variant="t", num_classes=10, window=2, pool_kernel=1)
    # one block per stage for a fast demo (keeps a W-MSA and an SW-MSA)
    keep = {"s0b0", "s0b1", "s1b0", "s2b0", "s3b0"}
    hp["architecture"] = [r for r in hp["architecture"]
                          if "swin_block" not in r
                          or r["swin_block"][0] in keep]
    m = DeepcvModule((32, 32, 3), hp)
    v = m.init(jax.random.PRNGKey(0))
    y = jax.jit(lambda v, x: m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))(
        v, jnp.ones((2, 32, 32, 3)))
    print("   train-mode logits:", y.shape)


def fpn_detection():
    print("== FPN detector: focal loss + flat decode + mAP@0.5 ==")
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.pipelines.detection import (create_fpn_detector,
                                                generate_shapes_dataset_fpn,
                                                train_fpn_detector)

    raw = generate_shapes_dataset_fpn(n=512, image_size=32, grids=(8, 4),
                                      seed=1)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    model = create_fpn_detector(data, {
        "act_fn": "relu", "fpn_channels": 32,
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16,
                        "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 32,
                        "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": ["c3", {"kernel_size": [3, 3], "out_channels": 32,
                               "padding": 1}]},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": ["c4", {"kernel_size": [3, 3], "out_channels": 64,
                               "padding": 1}]},
            {"_new_branch_from_tensor": {"_from": ["c3", "c4"]}},
        ]})
    hp = {"epochs": 6, "batch_size": 64, "optimizer_opts": {"lr": 2e-3},
          "optimizer": "adamw",
          "save_every_iters": 0, "output_path": "/tmp/deepcv_example_fpn",
          "seed": 0, "fpn_grids": (8, 4), "validate_every_epochs": 2,
          "log_progress_every_iters": 1_000_000}
    out = train_fpn_detector(data, model, hp)
    v = out["history"]["valid"]
    print(f"   mAP@0.5: {v[0]['valid_map50']:.3f} -> {v[-1]['valid_map50']:.3f}")


def segmentation():
    print("== semantic segmentation: per-pixel CE + mIoU ==")
    from deepcv_tpu.data.preprocess import preprocess
    from deepcv_tpu.pipelines.segmentation import (
        create_segmenter, generate_segmentation_dataset, train_segmenter)

    raw = generate_segmentation_dataset(n=256, image_size=16, seed=1)
    data = preprocess({"trainset": raw},
                      {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    model = create_segmenter(data, {
        "act_fn": "relu",
        "architecture": [
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16,
                        "padding": 1}},
            {"avg_pooling": {"kernel_size": [2, 2], "stride": [2, 2]}},
            {"conv2d": {"kernel_size": [3, 3], "out_channels": 16,
                        "padding": 1}},
        ]})
    hp = {"epochs": 8, "batch_size": 32, "optimizer_opts": {"lr": 5e-3},
          "save_every_iters": 0, "output_path": "/tmp/deepcv_example_seg",
          "seed": 0, "validate_every_epochs": 2,
          "log_progress_every_iters": 1_000_000}
    out = train_segmenter(data, model, hp)
    v = out["history"]["valid"]
    print(f"   mIoU: {v[0]['valid_mean_iou']:.3f} -> "
          f"{v[-1]['valid_mean_iou']:.3f}")


if __name__ == "__main__":
    vit_with_flash()
    convnext_forward()
    swin_forward()
    fpn_detection()
    segmentation()
    print("all green")
