"""Full wide-classifier fwd+bwd with/without weight_norm (no train loop)."""
import time
import jax, jax.numpy as jnp
import optax
import runpy

ns = runpy.run_path("bench.py")
_wide = ns["_wide_classifier_hp"]
from deepcv_tpu.spec import DeepcvModule

B = 4096
x = jax.random.uniform(jax.random.PRNGKey(0), (B, 32, 32, 3), jnp.bfloat16)
y = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 10)

def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

def bench(fn, *args, n=10):
    _sync(fn(*args)); t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3

for norm in ["none", "weight_norm"]:
    m = DeepcvModule((32, 32, 3), _wide(norm=norm), dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(2))

    def loss(params, x, y):
        lg = m.apply({"params": params}, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(3)})
        lg = lg[0] if isinstance(lg, tuple) else lg
        return optax.softmax_cross_entropy_with_integer_labels(
            lg.astype(jnp.float32), y).mean()

    f = jax.jit(lambda p, x, y: jax.value_and_grad(loss)(p, x, y))
    t = bench(f, v["params"], x, y)
    print(f"{norm:12s} fwd+bwd {t:7.2f}ms  ({B/t*1000:,.0f} img/s)", flush=True)
