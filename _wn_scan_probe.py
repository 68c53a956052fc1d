"""Does scan+adamw reproduce the weight_norm train-loop blowup?"""
import time
import jax, jax.numpy as jnp
import optax
import runpy

ns = runpy.run_path("bench.py")
_wide = ns["_wide_classifier_hp"]
from deepcv_tpu.spec import DeepcvModule

B, K = 4096, 4   # K scanned steps per dispatch

def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

def bench(fn, *args, n=6):
    _sync(fn(*args)); t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3

xs = jax.random.uniform(jax.random.PRNGKey(0), (K, B, 32, 32, 3), jnp.bfloat16)
ys = jax.random.randint(jax.random.PRNGKey(1), (K, B), 0, 10)

for norm in ["none", "weight_norm"]:
    m = DeepcvModule((32, 32, 3), _wide(norm=norm), dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(2))
    tx = optax.adamw(1e-3, weight_decay=1e-2)

    def loss(params, x, y):
        lg = m.apply({"params": params}, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(3)})
        lg = lg[0] if isinstance(lg, tuple) else lg
        return optax.softmax_cross_entropy_with_integer_labels(
            lg.astype(jnp.float32), y).mean()

    def step(carry, xy):
        p, o = carry
        l, g = jax.value_and_grad(loss)(p, xy[0], xy[1])
        u, o = tx.update(g, o, p)
        return (optax.apply_updates(p, u), o), l

    @jax.jit
    def run(p, o, xs, ys):
        (p, o), ls = jax.lax.scan(step, (p, o), (xs, ys))
        return p, o, ls

    o0 = tx.init(v["params"])
    t = bench(run, v["params"], o0, xs, ys)
    print(f"{norm:12s} {K}-step scan {t:8.2f}ms  ({K*B/t*1000:,.0f} img/s)", flush=True)
