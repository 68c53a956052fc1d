"""Every parallelism mode in one script: dp, dp x tp, accumulation, remat,
spatial partitioning, and GPipe pipeline stages.

Run anywhere: ``XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu python examples/distributed_training.py`` simulates an
8-chip mesh on CPU; on a real pod slice drop the env vars.
"""
import jax
import jax.numpy as jnp

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train import train, BackendConfig, cross_entropy_loss
from deepcv_tpu.parallel import (make_mesh, pipeline_parallel_apply,
                                 spatial_sharding)

MODEL = """
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null }
"""


def main():
    n = len(jax.devices())
    raw = load_dataset("synthetic", n=512, image_shape=(16, 16, 3),
                       num_classes=10, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.1},
                       "transforms": ["to_tensor"]})
    model = DeepcvModule((16, 16, 3), load_yaml(MODEL))

    # ---- dp x tp training with accumulation + remat, all composed --------- #
    hp = {"epochs": 1, "batch_size": 16 * n, "optimizer_opts": {"lr": 1e-3},
          "save_every_iters": 0, "log_progress_every_iters": 1, "seed": 0,
          "grad_accumulation_steps": 2, "remat": True,
          "output_path": "data/04_training"}
    tp = 2 if n >= 4 and n % 2 == 0 else 1
    be = BackendConfig(tensor_parallel=tp)
    state, hist = train(hp, model, cross_entropy_loss, data, backend_conf=be)
    print(f"trained on mesh {dict(be.mesh.shape)}; "
          f"last loss {hist['train'][-1]['main_loss']:.4f}")

    # ---- ZeRO-1: optimizer moments sharded over the data axis -------------- #
    be_z = BackendConfig(zero=True)
    state_z, hist_z = train(dict(hp, grad_accumulation_steps=1, remat=False),
                            model, cross_entropy_loss, data, backend_conf=be_z)
    spec = [str(getattr(l.sharding, "spec", ""))
            for l in jax.tree_util.tree_leaves(state_z.opt_state)
            if hasattr(l, "sharding") and "'data'" in str(
                getattr(l.sharding, "spec", ""))]
    print(f"ZeRO-1: {len(spec)} optimizer-state leaves data-sharded; "
          f"last loss {hist_z['train'][-1]['main_loss']:.4f}")

    # ---- spatial partitioning: batch-1 image too big for one chip --------- #
    sp_mesh = make_mesh({"data": n})
    big = DeepcvModule((64 * n, 64, 3), load_yaml(MODEL))
    v = big.init(jax.random.PRNGKey(0))
    x = jax.device_put(jnp.ones((1, 64 * n, 64, 3)), spatial_sharding(sp_mesh))
    y = jax.jit(lambda v, x: big.apply(v, x))(v, x)
    print("spatial-partitioned forward:", y.shape, "sharded on",
          x.sharding.spec)

    # ---- GPipe pipeline parallelism over a 'stage' axis -------------------- #
    S, F = n, 32
    ks = jax.random.split(jax.random.PRNGKey(1), S)
    stages = {"w": jnp.stack([jax.random.normal(k, (F, F)) * 0.2 for k in ks])}
    out = pipeline_parallel_apply(
        lambda p, h: jnp.tanh(h @ p["w"]), stages, jnp.ones((8 * S, F)),
        mesh=make_mesh({"stage": S}), n_microbatches=4 * S)
    print(f"pipeline over {S} stages:", out.shape)


if __name__ == "__main__":
    main()
