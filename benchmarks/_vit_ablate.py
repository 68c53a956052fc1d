"""ViT-B/16 forward decomposition (dev tool): time the pieces standalone —
MLP stack (with exact vs tanh GELU), attention stack (xla), LayerNorms,
patch embed — to find where the 15% fwd MFU goes. Median of 5 warm draws,
device_get sync (axon tunnel protocol)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

B, T, D, M, H, DH, L = 256, 197, 768, 3072, 12, 64, 12
PEAK = 197e12


def timed(fn, *args, reps=5):
    def sync(out):
        jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    sync(fn(*args))
    draws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        draws.append(time.perf_counter() - t0)
    return sorted(draws)[len(draws) // 2]


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
w1 = jax.random.normal(key, (D, M), jnp.bfloat16) * 0.02
w2 = jax.random.normal(key, (M, D), jnp.bfloat16) * 0.02
wqkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
wo = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02

from deepcv_tpu.ops.attention import attention_xla, gelu_exact


def mlp_stack(x, act):
    for _ in range(L):
        x = act(x @ w1) @ w2
    return x


def attn_stack(x):
    for _ in range(L):
        qkv = (x @ wqkv).reshape(B, T, 3, H, DH)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        y = attention_xla(q, k, v)
        x = y.transpose(0, 2, 1, 3).reshape(B, T, D) @ wo
    return x


def ln_stack(x):
    from flax import linen as fnn
    ln = fnn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    p = ln.init(key, x)
    f = lambda x: x
    for _ in range(2 * L):
        x = ln.apply(p, x)
    return x


gelu_tanh = jax.nn.gelu  # approximate=True default

mlp_flops = L * 2 * B * T * D * M * 2           # two matmuls per block
attn_mm_flops = L * (2 * B * T * D * 4 * D + 2 * B * H * T * T * DH * 2)

for name, fn, flops in (
    ("mlp gelu_exact", lambda x: mlp_stack(x, gelu_exact), mlp_flops),
    ("mlp gelu_tanh ", lambda x: mlp_stack(x, gelu_tanh), mlp_flops),
    ("mlp relu      ", lambda x: mlp_stack(x, jax.nn.relu), mlp_flops),
    ("attn stack xla", attn_stack, attn_mm_flops),
    ("2L layernorms ", ln_stack, 0),
):
    t = timed(jax.jit(fn), x)
    mfu = flops / t / PEAK * 100 if flops else 0
    print(f"{name}: {t*1e3:8.2f} ms  {mfu:5.1f}% MFU", flush=True)
