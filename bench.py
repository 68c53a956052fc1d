#!/usr/bin/env python
"""Headline benchmark: end-to-end augment+train throughput (img/s/chip).

BASELINE.json north star: >= 10,000 images/sec/chip end-to-end augment+train
for the YAML-spec CNN (`image_classifier`, reference
conf/base/parameters.yml:79-88) on CIFAR-10 on a TPU v5e chip.

The measured step is the REAL training step: on-device batch gather from the
HBM-resident dataset -> to_tensor -> augmentation recipe (brightness/contrast/
color/noise gates) -> normalize -> forward -> loss -> backward -> AdamW
update, all one jitted XLA program, bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/10000}
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


BASELINE_IMG_S = 10_000.0  # north-star target (BASELINE.md)


def build():
    from deepcv_tpu.config import load_yaml
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.data.datasets import load_dataset
    from deepcv_tpu.data.preprocess import preprocess

    # CIFAR-10 (real if cached, synthetic CIFAR-shaped otherwise: no egress)
    raw = load_dataset("cifar10", root="data/01_raw", train=True)

    params = load_yaml("""
seed: 434546
split_dataset: { validset_ratio: 0.05 }
transforms:
  - to_tensor
  - normalize: { mean: [0.491, 0.482, 0.447], std: [0.247, 0.243, 0.261] }
augmentation_recipe:
  keep_same_input_shape: true
  augmentation_ops_depth: [1, 4]
  transforms:
    - brightness: 0.2
    - contrast: 0.1
    - tweak_colors: 0.1
    - gamma: 0.05
    - noise: 0.1
""")
    data = preprocess({"trainset": raw}, params)

    # the reference image_classifier spec (parameters.yml:79-88) with its
    # basic_backbone (:8-19), classifier head sized for CIFAR-10
    model_hp = load_yaml("""
act_fn: leaky_relu
dropout_prob: 0.0
batch_norm: { affine: true, eps: 1e-05, momentum: 0.07359778246238029 }
architecture:
  - _nested_deepcvmodule:
      act_fn: relu
      group_norm: { num_groups: 4, eps: 1e-05 }
      architecture:
        - conv2d: { kernel_size: [5, 5], out_channels: 4, padding: 2 }
        - conv2d: { kernel_size: [5, 5], out_channels: 4, padding: 2 }
        - conv2d: { kernel_size: [5, 5], out_channels: 4, padding: 2 }
        - avg_pooling: ["pooling1", { kernel_size: [2, 2], stride: [2, 2] }]
        - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
        - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
        - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
        - dense_link: { _from: "pooling1", allow_scaling: true }
  - flatten: {}
  - fully_connected: { act_fn: sigmoid, out_features: 10, batch_norm: null }
""")
    return data, model_hp


def main():
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.train import train, BackendConfig
    from deepcv_tpu.train.losses import cross_entropy_loss

    data, model_hp = build()
    backend = BackendConfig()
    n_chips = backend.n_devices
    model = DeepcvModule((32, 32, 3), model_hp, dtype=jnp.bfloat16)

    batch = 4096 if backend.is_tpu else 256
    hp = {
        "epochs": 10 if backend.is_tpu else 3, "batch_size": batch,
        "optimizer": "adamw",
        "optimizer_opts": {"lr": 1e-3, "betas": [0.9, 0.999], "weight_decay": 1e-2},
        "save_every_iters": 0, "log_progress_every_iters": 1_000_000,
        "validate_every_epochs": 1000,   # throughput run: skip validation
        "seed": 563454, "output_path": "data/04_training",
        "device_resident_dataset": True, "dtype": "bfloat16",
    }
    state, hist = train(hp, model, cross_entropy_loss, data,
                        backend_conf=backend)
    # first epoch includes compile; steady state = later epochs
    tps = hist["throughput_img_s"]
    steady = max(tps[1:]) if len(tps) > 1 else tps[0]
    per_chip = steady / max(1, n_chips)
    print(json.dumps({
        "metric": "augment_train_throughput_cifar10_image_classifier",
        "value": round(per_chip, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
