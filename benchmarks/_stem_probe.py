"""Stem-conv (cin=8) reformulation probe: can any XLA formulation beat the
direct conv's ~10% MFU? (dev tool)"""
import time
import jax, jax.numpy as jnp
from functools import partial

B, HW, CIN, COUT = 4096, 32, 8, 64
PEAK = 197e12
FLOPS = 2 * 9 * CIN * COUT * HW * HW * B

def _sync(r):
    float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32))))

def bench(fn, *args, n=30):
    _sync(fn(*args)); t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n

x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, CIN), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT), jnp.bfloat16)

@jax.jit
def direct(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

@jax.jit
def patches_dot(x, w):
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))       # (B,H,W,9*CIN)
    # patches order: CIN-major or k-major? reshape w to match: (9*CIN, COUT)
    wf = jnp.transpose(w, (2, 0, 1, 3)).reshape(CIN * 9, COUT)
    return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())))

@jax.jit
def shift_accum(x, w):
    # 9 shifted views, one wide matmul: pad then static slices
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dh:dh + HW, dw:dw + HW, :] for dh in range(3) for dw in range(3)]
    p = jnp.concatenate(taps, axis=-1)                    # (B,H,W,72)
    wf = w.reshape(9 * CIN, COUT)                          # kh,kw,cin major
    return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())))

@jax.jit
def folded_matmul(x, w):
    # fold channels into W (lane dim stays dense): (B, H, W*CIN)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xf = xp.reshape(B, HW + 2, (HW + 2) * CIN)
    taps = []
    for dh in range(3):
        row = xf[:, dh:dh + HW, :]
        for dw in range(3):
            taps.append(row[:, :, dw * CIN:(dw + HW) * CIN].reshape(B, HW, HW, CIN))
    p = jnp.concatenate(taps, axis=-1)
    wf = w.reshape(9 * CIN, COUT)
    return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())))

y0 = direct(x, w)
for name, fn in [("direct", direct), ("patches+dot", patches_dot),
                 ("shift+matmul", shift_accum), ("folded+matmul", folded_matmul)]:
    y = fn(x, w)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0.astype(jnp.float32))))
    t = bench(fn, x, w)
    print(f"{name:14s} {t*1e3:6.2f}ms  {FLOPS/t/PEAK*100:5.1f}% MFU  maxerr={err:.3e}", flush=True)
