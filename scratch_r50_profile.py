"""Scratch: device-op breakdown of the config-9 ResNet-50 BN train step."""
import sys
import time

import jax
import jax.numpy as jnp

from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.spec.zoo import resnet_spec
from deepcv_tpu.train import train, BackendConfig
from deepcv_tpu.profiling import trace, xplane_op_summary
from deepcv_tpu.search.runner import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

norm = sys.argv[1] if len(sys.argv) > 1 else "batch_norm"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

backend = BackendConfig()
hw, n = 224, 8192
raw = load_dataset("synthetic", n=n, image_shape=(hw, hw, 3),
                   num_classes=1000, seed=0)
data = preprocess({"trainset": raw},
                  {"seed": 0, "split_dataset": {"validset_ratio": 0.03},
                   "transforms": ["to_tensor"]})
zoo_norm = None if norm in ("none",) else norm
hp_m = resnet_spec(50, num_classes=1000, pool_kernel=hw // 32, norm=zoo_norm)
model = DeepcvModule((hw, hw, 3), hp_m, dtype=jnp.bfloat16)
hp = {"epochs": 6, "batch_size": batch,
      "optimizer": "sgd", "optimizer_opts": {"lr": 0.1, "momentum": 0.9,
                                             "weight_decay": 1e-4},
      "save_every_iters": 0, "log_progress_every_iters": 1_000_000,
      "validate_every_epochs": 1000, "seed": 0,
      "output_path": "data/04_training",
      "device_resident_dataset": True, "dtype": "bfloat16",
      "max_epochs_per_dispatch": 2, "log_grad_norm": False,
      "handle_preemption": False}

logdir = "/tmp/r50prof"
with trace(logdir):
    state, hist = train(hp, model, "cross_entropy", data,
                        backend_conf=backend)
tps = hist["throughput_img_s"]
print("tps:", [round(t) for t in tps])

rows = [r for r in xplane_op_summary(logdir) if r["line"] == "XLA Ops"]
tot = sum(r["total_ms"] for r in rows)
print(f"device total: {tot:.1f} ms over trace")
import re


def bucket(op):
    m = re.search(r"%(\S+?)[\s=]", op)
    name = m.group(1) if m else op[:30]
    sig = op
    if "convolution" in name:
        return "convolution(raw)"
    if "fusion" in name:
        # classify by shapes in the signature
        if "bf16[7,7,3,64]" in sig or "f32[" in sig and "reduce" in sig:
            pass
    return name.split(".")[0]


agg = {}
for r in rows:
    b = bucket(r["op"])
    a = agg.setdefault(b, [0.0, 0])
    a[0] += r["total_ms"]
    a[1] += r["count"]
print("--- by op kind ---")
for k, (ms, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:15]:
    print(f"{ms:10.1f} ms ({100*ms/tot:5.1f}%) x{c:<6} {k}")
print("--- top single ops ---")
for r in rows[:25]:
    print(f"{r['total_ms']:9.2f} ms ({100*r['total_ms']/tot:5.1f}%) "
          f"x{r['count']:<5} {r['op'][:110]}")
