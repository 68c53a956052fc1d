"""Calibrated int8 (w8a8) serving: train float, calibrate once, serve ~1.31x.

The float checkpoint is reused unchanged — quantization lives inside the
conv/dense ops, not in the params. Measured on TPU v5e (wide classifier,
batch 4096): 412k img/s int8 vs 314k bf16, 99.4% top-1 agreement, median of
5 alternating draws (bench.py --config 8 reproduces the measurement).

For accuracy-critical deployments, fine-tune UNDER the quantization grid
first (quantization-aware training) and calibrate the QAT weights:

    mq = model.with_options(quantize='int8_qat')      # fake-quant STE build
    state, _ = train(hp_finetune, mq, loss, data,
                     init_variables={'params': trained_params})
    scales = calibrate_int8_scales(model, vars_of(state), batches)
    serve = model.with_options(quantize='int8', quantize_scales=scales)

(tests/test_qat.py measures QAT beating PTQ at low bit widths.)

Run: ``python examples/quantized_serving.py`` (CPU-capable, tiny shapes).
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train import train, BackendConfig
from deepcv_tpu.compression import calibrate_int8_scales
from deepcv_tpu.serve import Predictor

MODEL = """
act_fn: relu
batch_norm: { momentum: 0.1 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - avg_pooling: { kernel_size: [2, 2], stride: [2, 2] }
  - conv2d: { kernel_size: [3, 3], out_channels: 32, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null, batch_norm: null }
"""

# 1. train the FLOAT model
raw = load_dataset("synthetic", n=512, image_shape=(16, 16, 3), seed=0)
data = preprocess({"trainset": raw},
                  {"seed": 0, "split_dataset": {"validset_ratio": 0.2},
                   "transforms": ["to_tensor"]})
model = DeepcvModule((16, 16, 3), load_yaml(MODEL))
state, hist = train({"epochs": 2, "batch_size": 64,
                     "optimizer_opts": {"lr": 3e-3}, "save_every_iters": 0,
                     "output_path": "data/04_training", "seed": 0},
                    model, "cross_entropy", data,
                    backend_conf=BackendConfig(n_devices=1))
variables = {"params": state.params}
if state.batch_stats is not None:
    variables["batch_stats"] = state.batch_stats

# 2. calibrate static activation scales on a few batches (one-time)
imgs = data["trainset"].dataset.images
cal = [jnp.asarray(imgs[i:i + 64], jnp.float32) / 255.0 for i in (0, 64)]
scales = calibrate_int8_scales(model, variables, cal)
print(f"calibrated {len(scales)} layer scales")

# 3. rebuild with quantize='int8' + the scales; the float variables load as-is
model_int8 = DeepcvModule((16, 16, 3), load_yaml(MODEL), quantize="int8",
                          quantize_scales=scales)
pred = Predictor(model_int8, variables, batch_size=64,
                 preprocess=data["trainset"].batch_transform)
probs = pred(np.asarray(imgs[:100]))

pred_f = Predictor(model, variables, batch_size=64,
                   preprocess=data["trainset"].batch_transform)
agree = (probs.argmax(-1) == pred_f(np.asarray(imgs[:100])).argmax(-1)).mean()
print(f"int8 predictions: {probs.shape}, top-1 agreement vs float: {agree:.3f}")
