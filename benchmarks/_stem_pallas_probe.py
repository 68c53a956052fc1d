"""Existing Pallas im2col kernel on the cin=8 stem shape (gate bypassed)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
from deepcv_tpu.ops.pallas.fused_layer import fused_conv2d_bias_act

B, HW, CIN, COUT = 4096, 32, 8, 64
PEAK = 197e12
FLOPS = 2 * 9 * CIN * COUT * HW * HW * B

def _sync(r):
    float(jax.device_get(jnp.sum(r.astype(jnp.float32))))

def bench(fn, *args, n=30):
    _sync(fn(*args)); t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n

x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, CIN), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT), jnp.bfloat16)
b = jnp.zeros((COUT,), jnp.bfloat16)

ref = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
y0 = ref(x, w)
t = bench(ref, x, w)
print(f"XLA direct      {t*1e3:6.2f}ms  {FLOPS/t/PEAK*100:5.1f}%", flush=True)

for tb in (4, 8, 16, 32):
    try:
        f = jax.jit(lambda x, w, b: fused_conv2d_bias_act(x, w, b, None, tb))
        y = f(x, w, b)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0.astype(jnp.float32))))
        t = bench(f, x, w, b)
        print(f"pallas tb={tb:3d}   {t*1e3:6.2f}ms  {FLOPS/t/PEAK*100:5.1f}%  maxerr={err:.2e}", flush=True)
    except Exception as e:
        print(f"pallas tb={tb:3d}   FAILED: {str(e)[:150]}", flush=True)
