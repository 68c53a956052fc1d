"""QAT train-step overhead vs float on the wide classifier (dev tool)."""
import pathlib
import runpy
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp
import optax

ns = runpy.run_path(str(pathlib.Path(__file__).resolve().parent.parent / "bench.py"))
_wide = ns["_wide_classifier_hp"]
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.profiling import forced_sync_time

B = 4096
x = jax.random.uniform(jax.random.PRNGKey(0), (B, 32, 32, 3), jnp.bfloat16)
y = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 10)

for quant in [None, "int8_qat"]:
    m = DeepcvModule((32, 32, 3), _wide(norm="weight_norm"), dtype=jnp.bfloat16,
                     quantize=quant)
    v = m.init(jax.random.PRNGKey(2))

    def loss(params, x, y):
        lg = m.apply({"params": params}, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(3)})
        lg = lg[0] if isinstance(lg, tuple) else lg
        return optax.softmax_cross_entropy_with_integer_labels(
            lg.astype(jnp.float32), y).mean()

    f = jax.jit(lambda p, x, y: jax.value_and_grad(loss)(p, x, y))
    t = forced_sync_time(f, v["params"], x, y, n=10)
    print(f"quantize={str(quant):9s} fwd+bwd {t*1e3:7.2f}ms "
          f"({B/t:,.0f} img/s)", flush=True)
