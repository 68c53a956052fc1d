"""Why is flax WeightNorm 5x slower? Isolated conv probe (dev tool)."""
import time
import jax, jax.numpy as jnp
import flax.linen as fnn

B, HW, C = 4096, 32, 64

def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

def bench(fn, *args, n=20):
    _sync(fn(*args)); t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3

x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, C), jnp.bfloat16)

plain = fnn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16)
wn = fnn.WeightNorm(fnn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16))

for name, mod in [("plain", plain), ("flax WeightNorm", wn)]:
    v = mod.init(jax.random.PRNGKey(1), x)
    f = jax.jit(lambda v, x: mod.apply(v, x))
    g = jax.jit(jax.grad(lambda v, x: jnp.sum(mod.apply(v, x).astype(jnp.float32)), argnums=0))
    print(f"{name:16s} fwd {bench(f, v, x):7.2f}ms   bwd {bench(g, v, x):7.2f}ms", flush=True)

# manual weight standardization: same math, hand-rolled
class ManualWS(fnn.Module):
    feats: int = C
    @fnn.compact
    def __call__(self, x):
        k = self.param("kernel", fnn.initializers.lecun_normal(), (3, 3, C, self.feats), jnp.float32)
        g = self.param("scale", fnn.initializers.ones, (self.feats,), jnp.float32)
        b = self.param("bias", fnn.initializers.zeros, (self.feats,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(k), axis=(0, 1, 2), keepdims=True) + 1e-6)
        kn = ((k / norm) * g).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(x, kn, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(jnp.bfloat16)

mod = ManualWS()
v = mod.init(jax.random.PRNGKey(1), x)
f = jax.jit(lambda v, x: mod.apply(v, x))
g = jax.jit(jax.grad(lambda v, x: jnp.sum(mod.apply(v, x).astype(jnp.float32)), argnums=0))
print(f"{'manual WS':16s} fwd {bench(f, v, x):7.2f}ms   bwd {bench(g, v, x):7.2f}ms", flush=True)
