"""Train an image classifier declared in YAML, end to end.

Run: ``python examples/train_classifier.py`` (CPU-friendly sizes; on a TPU
just run it there — same code, the mesh picks up every chip).
"""
import jax

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train import train, BackendConfig, cross_entropy_loss
from deepcv_tpu.train.metrics import accuracy

MODEL = """
act_fn: relu
batch_norm: { momentum: 0.1 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - avg_pooling: ["p1", { kernel_size: [2, 2], stride: [2, 2] }]
  - conv2d: { kernel_size: [3, 3], out_channels: 32, padding: 1 }
  - dense_link: { _from: "p1", allow_scaling: true }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null, batch_norm: null }
"""


def main():
    # swap for load_dataset("cifar10", train=True) for the real set (falls
    # back to a cached CIFAR-shaped synthetic set in offline environments);
    # sizes here are demo-small so the script finishes quickly on a laptop
    # CPU — on a TPU raise n/batch_size/epochs freely (same code)
    raw = load_dataset("synthetic", n=512, image_shape=(32, 32, 3),
                       num_classes=10, seed=0)
    data = preprocess(
        {"trainset": raw},
        {"seed": 1, "split_dataset": {"validset_ratio": 0.1},
         "transforms": ["to_tensor", "normalize"],
         "augmentation_recipe": {"transforms": [
             {"random_horizontal_flip": 0.5}, {"brightness": 0.2},
             {"noise": 0.03}]}})

    model = DeepcvModule((32, 32, 3), load_yaml(MODEL))
    print(model.describe())

    hp = {"epochs": 2, "batch_size": 64,
          "optimizer": "adamw", "optimizer_opts": {"lr": 2e-3},
          # reference scheduler spec format: eval-string kwargs resolve safely
          # against {'hp', 'iterations'}
          "scheduler": {"type": "one_cycle", "eval_args": ["total_steps"],
                        "kwargs": {"max_lr": 4e-3,
                                   "total_steps": "hp['epochs'] * iterations"}},
          "save_every_iters": 0, "log_progress_every_iters": 4,
          "output_path": "data/04_training", "seed": 42}
    state, hist = train(hp, model, cross_entropy_loss, data,
                        backend_conf=BackendConfig(),
                        metrics={"accuracy": accuracy})
    print("train loss:", [round(r["main_loss"], 4) for r in hist["train"]][-4:])
    print("valid:", hist["valid"][-1])
    return state, hist


if __name__ == "__main__":
    main()
