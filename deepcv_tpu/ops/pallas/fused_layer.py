"""Fused conv2d + bias + activation Pallas kernel (the `layer()` unit core).

The north-star kernel exploration (SURVEY §7 step 3): the reference's
``layer()`` block (conv -> act, nn.py:519-554) as ONE TPU kernel. VERDICT
after benchmarking on v5e (see pallas_convs_enabled): XLA's native conv +
automatic epilogue fusion is faster in every tested regime, so the XLA path
is the default and this kernel is opt-in — "let XLA fuse; don't hand-schedule
what the compiler already does". Kept as a correct, grad-checked template for
custom epilogues XLA cannot express.

Strategy: im2col **inside VMEM**. Each grid step loads one padded-image batch
tile into VMEM, builds the (TB*H*W, kh*kw*C) patch matrix with cheap on-chip
shifted slices (never materialized in HBM), runs a single MXU matmul against
the (kh*kw*C, Cout) weight matrix, and applies bias + activation in the
epilogue before the single HBM write, avoiding any intermediate HBM traffic
for the patch matrix.

Backward: custom VJP delegating to the XLA reference implementation
(pallas guide "Patterns: Custom VJP") — identical math, so gradients agree
with the unfused path.

Restrictions (fall back to the XLA path otherwise — see ``supports``):
stride 1, 'same' padding, odd square-ish kernels, 2D NHWC.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv2d_bias_act", "supports"]


def supports(kernel_size, strides, padding, ndim: int,
             in_channels: Optional[int] = None,
             out_channels: Optional[int] = None) -> bool:
    """True when the fused kernel covers this conv configuration and a
    channel regime it can run at all (<32 channels the VPU lane padding
    (c -> 128 lanes) blows VMEM 4-16x). NOTE: even in-regime, measured XLA is
    faster (see pallas_convs_enabled's honest table) — this gate only guards
    feasibility for the opt-in path.
    """
    if ndim != 4:
        return False
    kh, kw = kernel_size
    if kh % 2 == 0 or kw % 2 == 0:
        return False
    if tuple(strides) != (1, 1):
        return False
    if in_channels is not None and in_channels < 32:
        return False
    if out_channels is not None and out_channels < 32:
        return False
    ph, pw = kh // 2, kw // 2
    return tuple(padding) in (((ph, ph), (pw, pw)),)


def _auto_batch_tile(n, h, w, c, kh, kw, cout, itemsize, budget=10 * 2 ** 20):
    """Largest batch tile whose materialized taps+patches fit VMEM (lanes pad
    channels up to 128)."""
    lane = 128

    def pad(x):
        return -(-x // lane) * lane

    per_img = h * w * itemsize * (kh * kw * pad(c) + pad(kh * kw * c) + pad(cout)) \
        + kw * (h + kh - 1) * w * pad(c) * itemsize
    tb = max(1, budget // max(per_img, 1))
    tb = min(tb, n)
    while n % tb:
        tb -= 1
    return tb


def _conv_ref(x, w, b, act: Optional[Callable]):
    """XLA reference implementation (used for backward + fallback)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + b.reshape(1, 1, 1, -1)
    if act is not None:
        y = act(y)
    return y.astype(x.dtype)


def _kernel(xs_ref, w_ref, b_ref, out_ref, *, kh, kw, act):
    # xs_ref: (kw, TB, H + kh - 1, W, C) — kw pre-shifted copies of the padded
    # input (shifted OUTSIDE the kernel: Mosaic cannot concat/rotate vectors
    # with mismatched W-dim sublane offsets, so every in-kernel slice below
    # starts at offset 0; only H-dim offsets vary, which are layout-free).
    _, tb, hp_, w, c = xs_ref.shape
    h = hp_ - (kh - 1)
    cols = []
    for i in range(kh):          # i-major, j-minor == w.reshape(kh*kw*c, ...) order
        for j in range(kw):
            cols.append(xs_ref[j, :, i:i + h, :, :])
    patches = jnp.concatenate(cols, axis=-1).reshape(tb * h * w, kh * kw * c)
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].reshape(1, -1)
    if act is not None:
        acc = act(acc)
    out_ref[:] = acc.reshape(tb, h, w, -1).astype(out_ref.dtype)


def _forward_pallas(x, w, b, act, batch_tile, interpret):
    n, h, wd, c = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
    # kw W-shifted views (XLA-side; one HBM pass) so in-kernel slices align
    xs = jnp.stack([xp[:, :, j:j + wd, :] for j in range(kw)], axis=0)
    if batch_tile is None:
        tb = _auto_batch_tile(n, h, wd, c, kh, kw, cout, x.dtype.itemsize)
    else:
        tb = min(batch_tile, n)
        while n % tb:
            tb -= 1
    grid = (n // tb,)
    wmat = w.reshape(kh * kw * c, cout)

    return pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kw, tb, h + 2 * ph, wd, c),
                         lambda i: (0, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * kh * kw * c * cout,
            bytes_accessed=xs.nbytes + wmat.nbytes + n * h * wd * cout * x.dtype.itemsize,
            transcendentals=0),
    )(xs, wmat, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_conv2d_bias_act(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          act: Optional[Callable] = None,
                          batch_tile: Optional[int] = None,
                          interpret: bool = False) -> jnp.ndarray:
    """stride-1 'same' conv + bias + activation as one Pallas kernel.

    x: (N, H, W, Cin) — Cin should be >= 8 (see ops.nn.pad_channels_for_tpu);
    w: (kh, kw, Cin, Cout) HWIO; b: (Cout,).
    """
    return _forward_pallas(x, w, b, act, batch_tile, interpret)


def _fwd(x, w, b, act, batch_tile, interpret):
    return _forward_pallas(x, w, b, act, batch_tile, interpret), (x, w, b)


def _bwd(act, batch_tile, interpret, residuals, g):
    x, w, b = residuals
    _, vjp = jax.vjp(lambda x_, w_, b_: _conv_ref(x_, w_, b_, act), x, w, b)
    return vjp(g)


fused_conv2d_bias_act.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# flax integration
# --------------------------------------------------------------------------- #

import os
import flax.linen as fnn


def pallas_convs_enabled() -> bool:
    """Fused Pallas convs are OPT-IN (DEEPCV_TPU_PALLAS=1).

    Measured on v5e (bf16, 32x32 images, proper jit args — beware
    constant-folding when benchmarking with closure-captured inputs):

        shape                 pallas     xla
        B256  3x3 64->64      0.051ms    0.020ms
        B256  3x3 128->128    1.961ms    0.958ms
        B1024 5x5 64->64      8.865ms    1.587ms
        B256  3x3 256->256    4.433ms    2.302ms

    XLA's native TPU conv wins across regimes — its layout choices beat this
    kernel's NHWC im2col (which re-reads the input kw times and pays lane
    padding). The kernel remains available for other-topology experiments and
    as the template for genuinely custom epilogues XLA cannot fuse.
    """
    env = os.environ.get("DEEPCV_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


class PallasConv(fnn.Module):
    """Drop-in Conv+bias+act using the fused kernel.

    Param names/shapes match ``flax.linen.Conv`` ('kernel' HWIO + 'bias'),
    so checkpoints are interchangeable with the XLA path.
    """
    features: int
    kernel_size: Tuple[int, int]
    act_fn: Optional[Callable] = None
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = fnn.initializers.lecun_normal()
    interpret: bool = False

    @fnn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, c, self.features), self.param_dtype)
        bias = self.param("bias", fnn.initializers.zeros,
                          (self.features,), self.param_dtype) if self.use_bias             else jnp.zeros((self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        if supports((kh, kw), (1, 1), pad, x.ndim, c, self.features) \
                and (self.interpret or jax.default_backend() != "cpu"):
            return fused_conv2d_bias_act(x.astype(dtype), kernel.astype(dtype),
                                         bias.astype(dtype), self.act_fn,
                                         None, self.interpret)
        # channel regime / backend outside the kernel's win zone: XLA path
        return _conv_ref(x.astype(dtype), kernel.astype(dtype),
                         bias.astype(dtype), self.act_fn)
