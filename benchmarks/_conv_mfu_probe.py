"""Per-shape conv fwd / fwd+bwd MFU probe on the real chip (dev tool)."""
import time
import jax, jax.numpy as jnp

PEAK = 197e12
B = 4096

def _sync(r):
    # axon tunnel: block_until_ready can return before remote execution ends;
    # pulling a scalar through device_get cannot be faked
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

def bench(fn, *args, n=30):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n

for (cin, cout, hw) in [(64, 64, 32), (128, 128, 16), (256, 256, 8), (8, 64, 32)]:
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, hw, hw, cin), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, cin, cout), jnp.bfloat16)

    def fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def loss(x, w):
        return jnp.sum(fwd(x, w).astype(jnp.float32))

    f_fwd = jax.jit(fwd)
    f_both = jax.jit(jax.grad(loss, argnums=(0, 1)))
    flops_fwd = 2 * 9 * cin * cout * hw * hw * B
    t_f = bench(f_fwd, x, w)
    t_b = bench(f_both, x, w)
    mfu_f = flops_fwd / t_f / PEAK
    mfu_b = 2 * flops_fwd / t_b / PEAK   # dgrad+wgrad ~ 2x fwd flops
    print(f"conv {cin:3d}->{cout:3d} @{hw}x{hw}: fwd {t_f*1e3:6.2f}ms {mfu_f*100:5.1f}%  "
          f"bwd(d+w) {t_b*1e3:6.2f}ms {mfu_b*100:5.1f}%", flush=True)
