"""Long-sequence attention-grad capability probe: where does the XLA
backward (O(T^2) HBM) stop and the Pallas flash backward keep going?
(dev tool; numbers recorded in docs/design.md 5.12)"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from deepcv_tpu.ops.attention import attention_xla, flash_attention

h, dh = 12, 64
for t in (8192, 16384):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, h, t, dh), jnp.bfloat16) for kk in ks)
    for name, fn in (("xla", attention_xla), ("flash", flash_attention)):
        try:
            g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                fn(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
            out = g(q, k, v)[0]; jax.device_get(jnp.sum(out))
            t0 = time.perf_counter()
            out = g(q, k, v)[0]; jax.device_get(jnp.sum(out))
            print(f"T={t} {name}: grad {1e3*(time.perf_counter()-t0):.1f} ms", flush=True)
        except Exception as e:
            print(f"T={t} {name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
