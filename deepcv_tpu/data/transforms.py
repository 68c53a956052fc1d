"""Batched on-device image transforms (NHWC, jit/vmap-friendly).

Replaces the reference's per-item CPU transform chain
(/root/reference/src/deepcv/meta/data/preprocess.py:35-63 running
torchvision/PIL ops inside DataLoader workers — SURVEY hot-loop #2). Here
every transform maps a BATCH of channel-last images and composes inside the
jitted train step, so augmentation rides the TPU's VPU instead of host CPUs.

Conventions:
  * images are float arrays in [0, 1], shape (N, H, W, C) — ``to_tensor``
    converts uint8 HWC input (value parity with torchvision ToTensor; layout
    stays NHWC because that is what the TPU tiles);
  * random transforms take an explicit ``key`` (jax.random) and draw one
    sample per batch element;
  * each transform is registered by name so YAML recipes resolve through the
    safe registry (reference '!py!torchvision.transforms.X' entries map via
    config.REFERENCE_NAME_ALIASES).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from deepcv_tpu.utils import register

__all__ = [
    "to_tensor", "normalize", "denormalize", "resize", "center_crop",
    "random_crop", "random_horizontal_flip", "random_vertical_flip",
    "pad", "color_jitter", "adjust_brightness", "adjust_contrast",
    "adjust_saturation", "adjust_hue", "rgb_to_grayscale", "random_rotate",
    "random_translate", "random_scale", "gaussian_noise", "adjust_gamma",
    "affine_transform", "Compose", "TRANSFORM_REGISTRY",
]

TRANSFORM_REGISTRY: Dict[str, Callable] = {}


def _register_transform(name: str, aliases: Sequence[str] = ()):
    def dec(fn):
        TRANSFORM_REGISTRY[name] = fn
        register(name, fn)
        for a in aliases:
            TRANSFORM_REGISTRY[a] = fn
            register(a, fn)
        return fn
    return dec


# --------------------------------------------------------------------------- #
# Deterministic transforms
# --------------------------------------------------------------------------- #

@_register_transform("to_tensor")
def to_tensor(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (torchvision ToTensor value parity;
    layout stays NHWC — reference returns CHW)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(jnp.float32)
    return x.astype(jnp.float32) / 255.0


@_register_transform("normalize")
def normalize(x: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Per-channel standardization (torchvision Normalize parity; channels
    last). Fidelity fixture: CIFAR-10 stats parameters.yml:197-201."""
    mean = jnp.asarray(mean, dtype=x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    std = jnp.asarray(std, dtype=x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return (x - mean) / std


@_register_transform("denormalize")
def denormalize(x, mean, std):
    mean = jnp.asarray(mean, dtype=x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    std = jnp.asarray(std, dtype=x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return x * std + mean


@_register_transform("resize")
def resize(x: jnp.ndarray, size: Union[int, Tuple[int, int]],
           method: str = "bilinear", antialias: bool = True) -> jnp.ndarray:
    """Resize batch to (H', W') — bilinear default (torchvision Resize).

    ``size`` int means torchvision's shorter-side semantics only when aspect
    differs; here int -> square (document: pass a pair for exact parity)."""
    if isinstance(size, int):
        size = (size, size)
    out_shape = (x.shape[0], int(size[0]), int(size[1]), x.shape[-1])
    return jax.image.resize(x, out_shape, method=method, antialias=antialias)


@_register_transform("center_crop")
def center_crop(x: jnp.ndarray, size: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    if isinstance(size, int):
        size = (size, size)
    h, w = x.shape[1], x.shape[2]
    top = (h - size[0]) // 2
    left = (w - size[1]) // 2
    return x[:, top:top + size[0], left:left + size[1], :]


@_register_transform("pad")
def pad(x: jnp.ndarray, padding: Union[int, Tuple[int, int]], mode: str = "constant",
        value: float = 0.0) -> jnp.ndarray:
    if isinstance(padding, int):
        padding = (padding, padding)
    cfg = [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)]
    if mode == "constant":
        return jnp.pad(x, cfg, mode="constant", constant_values=value)
    return jnp.pad(x, cfg, mode=mode)


@_register_transform("rgb_to_grayscale", aliases=("grayscale",))
def rgb_to_grayscale(x: jnp.ndarray, keep_channels: bool = True) -> jnp.ndarray:
    """ITU-R 601-2 luma (PIL convert('L') weights). 1/2-channel images (e.g.
    MNIST) are already 'L': convert is the identity, matching PIL's behavior
    instead of crashing on the missing channels. 4+-channel inputs (RGBA,
    stacked frames) take the luma of their first 3 channels, like PIL's
    RGBA->L."""
    if x.shape[-1] < 3:
        g = x[..., :1]
    else:
        w = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
        g = jnp.tensordot(x[..., :3], w, axes=([-1], [0]))[..., None]
    if keep_channels:
        g = jnp.broadcast_to(g, x.shape[:-1] + (x.shape[-1],))
    return g


@_register_transform("adjust_gamma", aliases=("gamma",))
def adjust_gamma(x: jnp.ndarray, gamma: Union[float, jnp.ndarray],
                 gain: float = 1.0) -> jnp.ndarray:
    gamma = jnp.asarray(gamma, dtype=x.dtype)
    if gamma.ndim == 1:  # per-sample
        gamma = gamma.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.clip(gain * jnp.clip(x, 0.0, 1.0) ** gamma, 0.0, 1.0)


# --------------------------------------------------------------------------- #
# Photometric adjustments (PIL ImageEnhance parity: out = img*f + degenerate*(1-f))
# --------------------------------------------------------------------------- #

def _blend(a: jnp.ndarray, b: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL Image.blend semantics: b + factor*(a-b), clipped to [0,1]."""
    factor = jnp.asarray(factor, dtype=a.dtype)
    if factor.ndim == 1:
        factor = factor.reshape((-1,) + (1,) * (a.ndim - 1))
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


@_register_transform("adjust_brightness")
def adjust_brightness(x: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Brightness: blend with black."""
    return _blend(x, jnp.zeros_like(x), factor)


@_register_transform("adjust_contrast")
def adjust_contrast(x: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Contrast: blend with the mean-gray image.
    PIL computes mean of the L-converted image (uint8-rounded)."""
    # PIL: mean = int(mean-of-uint8-L + 0.5) / 255 — quantized for parity
    # (L uses truncating integer conversion: (r*299+g*587+b*114)//1000);
    # non-RGB images are already L-mode (identity convert)
    if x.shape[-1] == 3:
        l_u8 = jnp.floor((jnp.round(x[..., 0] * 255) * 299
                          + jnp.round(x[..., 1] * 255) * 587
                          + jnp.round(x[..., 2] * 255) * 114) / 1000.0)
    else:
        l_u8 = jnp.round(x[..., 0] * 255)
    mean = jnp.floor(jnp.mean(l_u8, axis=(1, 2), keepdims=True) + 0.5)[..., None] / 255.0
    return _blend(x, jnp.broadcast_to(mean, x.shape), factor)


@_register_transform("adjust_saturation", aliases=("adjust_color", "tweak_colors"))
def adjust_saturation(x: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Color: blend with grayscale."""
    return _blend(x, rgb_to_grayscale(x, keep_channels=True), factor)


@_register_transform("adjust_hue")
def adjust_hue(x: jnp.ndarray, factor) -> jnp.ndarray:
    """Shift hue by ``factor`` (in turns, [-0.5, 0.5]) via RGB<->HSV."""
    factor = jnp.asarray(factor, dtype=x.dtype)
    if factor.ndim == 1:
        factor = factor.reshape((-1, 1, 1))
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn + 1e-12
    h = jnp.where(mx == r, (g - b) / diff % 6.0,
                  jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0)) / 6.0
    s = jnp.where(mx > 0, diff / (mx + 1e-12), 0.0)
    v = mx
    h = (h + factor) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


@_register_transform("color_jitter")
def color_jitter(x: jnp.ndarray, key, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0) -> jnp.ndarray:
    """torchvision ColorJitter: per-sample random factors in
    [max(0,1-v), 1+v] (hue in [-hue, hue]); fixed application order
    brightness->contrast->saturation->hue (torchvision shuffles; fixed order
    keeps the op jit-static — distributionally equivalent for small jitter)."""
    n = x.shape[0]
    ks = jax.random.split(key, 4)
    if brightness:
        f = jax.random.uniform(ks[0], (n,), minval=max(0.0, 1 - brightness),
                               maxval=1 + brightness)
        x = adjust_brightness(x, f)
    if contrast:
        f = jax.random.uniform(ks[1], (n,), minval=max(0.0, 1 - contrast),
                               maxval=1 + contrast)
        x = adjust_contrast(x, f)
    if saturation:
        f = jax.random.uniform(ks[2], (n,), minval=max(0.0, 1 - saturation),
                               maxval=1 + saturation)
        x = adjust_saturation(x, f)
    if hue:
        f = jax.random.uniform(ks[3], (n,), minval=-hue, maxval=hue)
        x = adjust_hue(x, f)
    return x


# --------------------------------------------------------------------------- #
# Geometric transforms (batched affine warps)
# --------------------------------------------------------------------------- #

def affine_transform(x: jnp.ndarray, matrices: jnp.ndarray,
                     order: int = 1, cval: float = 0.0,
                     pil_exact_u8: bool = False) -> jnp.ndarray:
    """Apply per-sample inverse affine ``matrices`` (N, 2, 3) to NHWC batch.

    PIL ``Image.transform(AFFINE, BILINEAR)`` semantics (verified byte-exact
    against Pillow's Geometry.c over randomized affines):

      * output pixel (i, j) samples the source at ``src = M @ (j+0.5, i+0.5)``;
      * the pixel is FILLED with ``cval`` iff the (unshifted) source center
        falls outside ``[0, W) x [0, H)``;
      * otherwise the 4 taps around ``src - 0.5`` are EDGE-CLAMPED and
        combined as ``a + d*(b - a)`` lerps.

    With ``pil_exact_u8`` the op additionally quantizes like PIL's uint8
    store: inputs snapped to the u8 grid, result truncated to an integer
    level (<= 1 u8 level from Pillow in float32; bit-exact where the
    interpolation weights are exact, e.g. integer translations / 90-degree
    rotations). Implemented as a bilinear gather — pure VPU work on TPU.
    """
    n, h, w, c = x.shape
    jj, ii = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    ones = jnp.ones_like(ii)
    coords = jnp.stack([jj + 0.5, ii + 0.5, ones], axis=0).reshape(3, -1)  # (3, H*W)
    fill = cval * 255.0 if pil_exact_u8 else cval

    def warp_one(img, m):
        img = img.astype(jnp.float32)
        if pil_exact_u8:
            img = jnp.round(jnp.clip(img, 0, 1) * 255.0)
        src = m @ coords                      # (2, H*W): (x_src, y_src)
        inside = ((src[0] >= 0) & (src[0] < w) &
                  (src[1] >= 0) & (src[1] < h))
        sx = src[0] - 0.5
        sy = src[1] - 0.5
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        dx = sx - x0
        dy = sy - y0

        def gather(yi, xi):
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return img[yc, xc]                # (H*W, C)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        top = v00 + dx[:, None] * (v01 - v00)
        bot = v10 + dx[:, None] * (v11 - v10)
        out = top + dy[:, None] * (bot - top)
        out = jnp.where(inside[:, None], out, fill)
        if pil_exact_u8:
            out = jnp.floor(out) / 255.0
        return out.reshape(h, w, c).astype(x.dtype)

    return jax.vmap(warp_one)(x, matrices.astype(jnp.float32))


def _center_affine(n: int, h: int, w: int, a, b, c_, d, tx=None, ty=None):
    """Build (N,2,3) inverse affines rotating/shearing about the image center."""
    cx, cy = w / 2.0, h / 2.0
    zeros = jnp.zeros((n,))
    a, b, c_, d = (jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,)) for v in (a, b, c_, d))
    tx = zeros if tx is None else jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (n,))
    ty = zeros if ty is None else jnp.broadcast_to(jnp.asarray(ty, jnp.float32), (n,))
    # x_src = a*(x-cx) + b*(y-cy) + cx + tx ; y_src = c*(x-cx) + d*(y-cy) + cy + ty
    e = -a * cx - b * cy + cx + tx
    f = -c_ * cx - d * cy + cy + ty
    row0 = jnp.stack([a, b, e], axis=-1)
    row1 = jnp.stack([c_, d, f], axis=-1)
    return jnp.stack([row0, row1], axis=1)


@_register_transform("random_rotate", aliases=("rotate",))
def random_rotate(x: jnp.ndarray, key, degrees: Union[float, Tuple[float, float]],
                  distribution: str = "uniform") -> jnp.ndarray:
    """Random rotation about the center, per sample. ``degrees`` scalar v
    means [-v, v]. Reference recipe semantics: 'rotate: [-a, b]' ranges are
    fractions of 180 deg (parameters.yml:164)."""
    n = x.shape[0]
    if isinstance(degrees, (int, float)):
        lo, hi = -float(degrees), float(degrees)
    else:
        lo, hi = float(degrees[0]), float(degrees[1])
    theta = jnp.deg2rad(jax.random.uniform(key, (n,), minval=lo, maxval=hi))
    # PIL counterclockwise convention: inverse map is [cos, -sin; sin, cos]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    m = _center_affine(n, x.shape[1], x.shape[2], cos, -sin, sin, cos)
    return affine_transform(x, m)


@_register_transform("random_translate", aliases=("translate",))
def random_translate(x: jnp.ndarray, key, max_frac: float) -> jnp.ndarray:
    """Random per-sample translation up to ``max_frac`` of each spatial dim."""
    n, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    tx = jax.random.uniform(k1, (n,), minval=-max_frac, maxval=max_frac) * w
    ty = jax.random.uniform(k2, (n,), minval=-max_frac, maxval=max_frac) * h
    m = _center_affine(n, h, w, 1.0, 0.0, 0.0, 1.0, tx=tx, ty=ty)
    return affine_transform(x, m)


@_register_transform("random_scale", aliases=("scale",))
def random_scale(x: jnp.ndarray, key, max_frac: float) -> jnp.ndarray:
    """Random per-sample isotropic zoom in [1-f, 1+f] about the center."""
    n, h, w, _ = x.shape
    s = jax.random.uniform(key, (n,), minval=1.0 - max_frac, maxval=1.0 + max_frac)
    inv = 1.0 / s
    m = _center_affine(n, h, w, inv, 0.0, 0.0, inv)
    return affine_transform(x, m)


@_register_transform("random_crop")
def random_crop(x: jnp.ndarray, key, size: Union[int, Tuple[int, int]],
                padding: int = 0) -> jnp.ndarray:
    """Per-sample random crop (with optional reflection-free zero padding),
    torchvision RandomCrop semantics."""
    if isinstance(size, int):
        size = (size, size)
    if padding:
        x = pad(x, padding)
    n, h, w, c = x.shape
    k1, k2 = jax.random.split(key)
    top = jax.random.randint(k1, (n,), 0, h - size[0] + 1)
    left = jax.random.randint(k2, (n,), 0, w - size[1] + 1)

    def crop_one(img, t, l):
        return jax.lax.dynamic_slice(img, (t, l, 0), (size[0], size[1], c))

    return jax.vmap(crop_one)(x, top, left)


@_register_transform("random_horizontal_flip", aliases=("hflip",))
def random_horizontal_flip(x: jnp.ndarray, key, p: float = 0.5) -> jnp.ndarray:
    n = x.shape[0]
    flip = jax.random.bernoulli(key, p, (n,))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


@_register_transform("random_vertical_flip", aliases=("vflip",))
def random_vertical_flip(x: jnp.ndarray, key, p: float = 0.5) -> jnp.ndarray:
    n = x.shape[0]
    flip = jax.random.bernoulli(key, p, (n,))
    return jnp.where(flip[:, None, None, None], x[:, ::-1, :, :], x)


@_register_transform("gaussian_noise", aliases=("noise",))
def gaussian_noise(x: jnp.ndarray, key, sigma: float = 0.1) -> jnp.ndarray:
    return jnp.clip(x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype), 0.0, 1.0)


# --------------------------------------------------------------------------- #
# Composition
# --------------------------------------------------------------------------- #

class Compose:
    """Compose transforms; random ones get split keys
    (torchvision.transforms.Compose parity for batched fns).

    Entries are ``(fn, kwargs)`` pairs or bare callables. Call with
    ``(x, key)``; the key is split across the random transforms (those whose
    signature has a ``key`` argument).
    """

    def __init__(self, entries: Sequence[Any]):
        import inspect
        self.steps = []
        for e in entries:
            fn, kwargs = (e if isinstance(e, tuple) else (e, {}))
            needs_key = "key" in inspect.signature(fn).parameters
            self.steps.append((fn, dict(kwargs), needs_key))

    def __call__(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        n_random = sum(1 for _, _, nk in self.steps if nk)
        keys = list(jax.random.split(key, n_random)) if (key is not None and n_random) else []
        ki = 0
        for fn, kwargs, needs_key in self.steps:
            if needs_key:
                if not keys:
                    raise ValueError(f"Transform {fn.__name__} needs a PRNG key; "
                                     "pass key= to Compose.__call__")
                x = fn(x, keys[ki], **kwargs)
                ki += 1
            else:
                x = fn(x, **kwargs)
        return x

    def __repr__(self):
        return "Compose([" + ", ".join(f.__name__ for f, _, _ in self.steps) + "])"


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
