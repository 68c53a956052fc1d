"""Fused augmentation+preprocessing Pallas kernel.

One VMEM pass per batch tile does what the reference runs as a per-item PIL
chain in DataLoader workers (SURVEY hot-loop #2) and what the pure-XLA path
runs as ~15 HBM-roundtripping ops:

    uint8 -> float/255 -> brightness -> contrast -> saturation -> gamma
          -> gaussian noise (in-kernel TPU PRNG) -> per-channel normalize

Per-image factors (with Bernoulli gating folded in: gated-off ops get their
neutral factor) are computed OUTSIDE with jax.random — tiny arrays, keeps
exact parity with deepcv_tpu.data.transforms testable — while all per-PIXEL
math happens in one kernel: a single HBM read of the uint8 batch and a single
write of the normalized output.

The pure-jnp reference semantics live in deepcv_tpu/data/transforms.py
(adjust_brightness/_contrast/_saturation/adjust_gamma/normalize); this kernel
must match them within 1e-5 (tested in tests/test_pallas.py).

STATUS: experimental / not wired into the hot path. XLA already fuses the
whole augment chain into the train step (measured 0.04ms for batch 4096 on
v5e — firmly dispatch-bound, not compute-bound), and this environment's
Mosaic compiler is extremely slow on the kernel's transcendental mix. Kept
as the on-chip-PRNG augmentation template; correctness is interpret-mode
tested.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_augment_normalize"]


def _kernel(seed_ref,  # scalar prefetch: (1,) int32
            x_ref, bright_ref, contrast_ref, sat_ref, gamma_ref, sigma_ref,
            mean_ref, std_ref, out_ref, *, use_noise: bool):
    # Layout note: x_ref is (TB, C, H, W) — channel-FIRST inside the kernel.
    # NHWC with C=3 would put 3 channels in the 128-lane dim (42x VMEM pad);
    # NCHW puts W in lanes (32 -> 128, 4x) which Mosaic handles fine.
    # Mosaic has no uint8->f32 cast; go via int32 (supported).
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    def f(ref):  # factors arrive pre-shaped (TB, 1, 1, 1); Mosaic dislikes
        return ref[:]  # in-kernel rank-changing reshapes of small vectors

    # brightness: PIL blend with black == x * factor, clipped
    x = jnp.clip(x * f(bright_ref), 0.0, 1.0)

    # contrast: blend with per-image mean gray (ITU-R 601-2 luma, quantized
    # like PIL's uint8 L conversion — transforms.adjust_contrast parity)
    l_u8 = jnp.floor((jnp.round(x[:, 0] * 255.0) * 299.0
                      + jnp.round(x[:, 1] * 255.0) * 587.0
                      + jnp.round(x[:, 2] * 255.0) * 114.0) * (1.0 / 1000.0))
    # Mosaic only supports trailing-dim reductions ending in a size-1 axis:
    # reduce W then H separately instead of axis=(1, 2) at once
    hw = float(l_u8.shape[1] * l_u8.shape[2])
    gray_sum = jnp.sum(jnp.sum(l_u8, axis=2, keepdims=True), axis=1, keepdims=True)
    mean_gray = jnp.floor(gray_sum / hw + 0.5)[:, None] / 255.0  # (TB,1,1,1)
    x = jnp.clip(mean_gray + f(contrast_ref) * (x - mean_gray), 0.0, 1.0)

    # saturation: blend with grayscale (ITU-R 601-2 luma, scalar weights)
    gray = (x[:, 0] * 0.299 + x[:, 1] * 0.587 + x[:, 2] * 0.114)[:, None]
    x = jnp.clip(gray + f(sat_ref) * (x - gray), 0.0, 1.0)

    # gamma
    x = jnp.clip(jnp.clip(x, 0.0, 1.0) ** f(gamma_ref), 0.0, 1.0)

    if use_noise:
        # gaussian noise from the on-chip PRNG (Box-Muller over uniform bits);
        # pltpu.prng_* has no CPU lowering, so the noise stage is trace-time
        # optional (use_noise=False for interpret-mode tests)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        shape = x.shape
        u1 = pltpu.prng_random_bits(shape).astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        u2 = pltpu.prng_random_bits(shape).astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        u1 = jnp.clip(u1, 1e-7, 1.0)
        normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
        x = jnp.clip(x + f(sigma_ref) * normal, 0.0, 1.0)

    # per-channel normalize (channel axis = 1; mean/std arrive (1, C, 1, 1))
    x = (x - mean_ref[:]) / std_ref[:]
    out_ref[:] = x.astype(out_ref.dtype)


def fused_augment_normalize(images_u8: jnp.ndarray,
                            brightness: jnp.ndarray, contrast: jnp.ndarray,
                            saturation: jnp.ndarray, gamma: jnp.ndarray,
                            noise_sigma: Optional[jnp.ndarray],
                            mean: Sequence[float], std: Sequence[float],
                            seed: int = 0, out_dtype=jnp.float32,
                            batch_tile: int = 256,
                            interpret: bool = False) -> jnp.ndarray:
    """Apply the fused augment+normalize kernel to a uint8 NHWC batch.

    ``brightness``/``contrast``/``saturation``/``gamma``/``noise_sigma`` are
    per-image (N,) factor arrays; pass the neutral value (1, 1, 1, 1, 0) for
    gated-off images. ``interpret=True`` runs the Pallas interpreter (CPU
    testing).
    """
    n, h, w, c = images_u8.shape
    batch_tile = min(batch_tile, n)
    if n % batch_tile:
        raise ValueError(f"batch {n} must be divisible by batch_tile {batch_tile}")
    grid = (n // batch_tile,)
    x_nchw = jnp.transpose(images_u8, (0, 3, 1, 2))

    def fac(a):
        return jnp.asarray(a, jnp.float32).reshape(n, 1, 1, 1)

    mean = jnp.asarray(mean, jnp.float32).reshape(1, c, 1, 1)
    std = jnp.asarray(std, jnp.float32).reshape(1, c, 1, 1)
    seed_arr = jnp.asarray([seed], jnp.int32)

    # index maps under PrefetchScalarGridSpec receive (grid_idx, *scalar_refs)
    img_spec = pl.BlockSpec((batch_tile, c, h, w), lambda i, s: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    fac_spec = pl.BlockSpec((batch_tile, 1, 1, 1), lambda i, s: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, c, 1, 1), lambda i, s: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[img_spec, fac_spec, fac_spec, fac_spec, fac_spec, fac_spec,
                  const_spec, const_spec],
        out_specs=pl.BlockSpec((batch_tile, c, h, w), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    use_noise = noise_sigma is not None
    sigma = fac(noise_sigma if use_noise else jnp.zeros((n,)))
    out_nchw = pl.pallas_call(
        functools.partial(_kernel, use_noise=use_noise),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), out_dtype),
        interpret=interpret,
    )(seed_arr, x_nchw, fac(brightness), fac(contrast), fac(saturation),
      fac(gamma), sigma, mean, std)
    return jnp.transpose(out_nchw, (0, 2, 3, 1))
