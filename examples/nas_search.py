"""Single-shot NAS: train a weight-sharing supernet over YAML choice points,
then pick the architecture by shared-weight validation.

Four genuinely distinct algorithms share the supernet plumbing
(search/nas.py):
  * darts         — softmax mixture, logits trained by gradient;
  * spos          — uniform path sampling, validation selects post hoc;
  * proxylessnas  — binary-gate path sampling + expected-cost (latency)
                    objective (``latency_weight=``);
  * enas          — RL controller: REINFORCE on validation reward with an
                    EMA baseline, alternating weight/controller phases.

Run: ``python examples/nas_search.py [darts|spos|proxylessnas|enas]``
"""
import sys
import jax

from deepcv_tpu.config import load_yaml
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.search.nas import single_shot_neural_architecture_search
from deepcv_tpu.train import cross_entropy_loss
from deepcv_tpu.train.metrics import accuracy

# _nas_layer_choice declares mutable ops; _nas_input_choice mutable wiring
SUPERNET = """
act_fn: relu
architecture:
  - _nas_layer_choice:
      _name: block1
      _candidates:
        - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
        - conv2d: { kernel_size: [5, 5], out_channels: 16, padding: 2 }
  - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null }
"""


def main():
    raw = load_dataset("synthetic", n=512, image_shape=(16, 16, 3),
                       num_classes=10, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.2},
                       "transforms": ["to_tensor"]})
    hp = {"epochs": 2, "batch_size": 128, "optimizer_opts": {"lr": 2e-3},
          "save_every_iters": 0, "log_progress_every_iters": 2, "seed": 0,
          "output_path": "data/04_training"}
    algorithm = sys.argv[1] if len(sys.argv) > 1 else "darts"
    arch, state, history = single_shot_neural_architecture_search(
        (16, 16, 3), load_yaml(SUPERNET), hp, cross_entropy_loss, data,
        metrics={"accuracy": accuracy}, algorithm=algorithm)
    print("chosen architecture:", arch)
    if history.get("controller"):              # enas: per-round RL stats
        print("controller:", history["controller"][-1])
    if history["valid"]:
        print("supernet valid:", history["valid"][-1])


if __name__ == "__main__":
    main()
