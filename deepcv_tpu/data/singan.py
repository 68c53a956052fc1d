"""SinGAN-based generative augmentation — a WORKING take on the reference's
stub (`deepcv.meta.data.singan`, singan.py:56: "distill a per-image SinGAN to
synthesize augmentation variants"; the reference never implemented it).

SinGAN (Shaham et al., arXiv:1905.01164): a pyramid of tiny per-scale GANs
trained on ONE image; sampling walks the pyramid coarse->fine, injecting
noise at each scale, producing novel variants that keep the image's patch
statistics — exactly the augmentation-diversity use case the reference
wanted.

TPU-native design decisions:
  * each scale's whole training run is ONE ``lax.scan`` over steps (a single
    device program per scale — no per-step host dispatch);
  * both adversarial updates (D then G) happen inside one scan body, so the
    alternating-optimization loop never leaves the device;
  * LSGAN losses (least-squares, Mao et al. arXiv:1611.04076) instead of the
    paper's WGAN-GP: no per-example gradient penalty, so the step stays a
    single fused XLA program;
  * static shapes everywhere: the scale pyramid is computed host-side once,
    each scale jits exactly one (H_s, W_s) program.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["SinGAN", "train_singan", "distilled_singan_augmentation"]

_logger = logging.getLogger(__name__)


class _ConvStack(fnn.Module):
    """5-layer conv trunk shared by G and D (SinGAN's per-scale net)."""
    features: int = 32
    out_channels: int = 3
    n_layers: int = 5
    final_act: Optional[str] = None

    @fnn.compact
    def __call__(self, x):
        h = x
        for i in range(self.n_layers - 1):
            h = fnn.Conv(self.features, (3, 3), padding="SAME")(h)
            h = fnn.GroupNorm(num_groups=4)(h)
            h = fnn.leaky_relu(h, negative_slope=0.2)
        h = fnn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        if self.final_act == "tanh":
            h = jnp.tanh(h)
        return h


def _resize(x, h, w):
    return jax.image.resize(x, (*x.shape[:-3], h, w, x.shape[-1]), "bilinear")


def _pyramid_shapes(h, w, n_scales: int, scale_factor: float,
                    min_size: int) -> List[Tuple[int, int]]:
    shapes = []
    for s in range(n_scales):
        f = scale_factor ** (n_scales - 1 - s)
        shapes.append((max(min_size, int(round(h * f))),
                       max(min_size, int(round(w * f)))))
    return shapes


class SinGAN:
    """A trained pyramid: per-scale generator params + noise amplitudes."""

    def __init__(self, gen_params: Sequence[Any], noise_amps: Sequence[float],
                 shapes: Sequence[Tuple[int, int]], features: int,
                 rec_z0: jnp.ndarray, channels: int = 3):
        self.gen_params = list(gen_params)
        self.noise_amps = [float(a) for a in noise_amps]
        self.shapes = list(shapes)
        self.features = int(features)
        self.channels = int(channels)
        self.rec_z0 = rec_z0                      # fixed coarsest noise (recon path)
        self._gen = _ConvStack(features=features, out_channels=self.channels,
                               final_act="tanh")

    # ------------------------------------------------------------- sampling
    def sample(self, key, n: int = 1, start_scale: int = 0) -> jnp.ndarray:
        """Generate n variants in [0, 1]; ``start_scale > 0`` keeps the global
        layout of the training image and only resamples finer textures
        (SinGAN's "paint-to-image" regime — the right mode for augmentation)."""
        h0, w0 = self.shapes[0]
        c = self.channels
        x = jnp.zeros((n, h0, w0, c))
        for s, (hs, ws) in enumerate(self.shapes):
            x = _resize(x, hs, ws)
            if s < start_scale:                     # follow the recon path
                z = (jnp.broadcast_to(self.rec_z0, (n, hs, ws, c))
                     if s == 0 else jnp.zeros((n, hs, ws, c)))
            else:
                key, k = jax.random.split(key)
                z = self.noise_amps[s] * jax.random.normal(k, (n, hs, ws, c))
            x = x + self._gen.apply(self.gen_params[s], x + z)
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)

    def reconstruct(self) -> jnp.ndarray:
        """The pyramid's fixed-noise reconstruction of the training image."""
        return self.sample(jax.random.PRNGKey(0), n=1,
                           start_scale=len(self.shapes))

    def harmonize(self, image: jnp.ndarray, key: Optional[jax.Array] = None,
                  start_scale: int = 1, mask: Optional[jnp.ndarray] = None,
                  ) -> jnp.ndarray:
        """SinGAN editing / harmonization / completion (arXiv:1905.01164 §4
    applications; the reference's 'image completion/reconstruction/
    combination ... from SinGAN' TODO, README.md:154): inject an EDITED
    image — naively pasted object, crude fill of a hole, paint strokes —
    at an intermediate pyramid scale and run only the finer generator
    scales over it, so the injected content is re-rendered in the training
    image's texture statistics.

    ``image``: (H, W, C) or (N, H, W, C) in [0, 1] at the finest
    resolution. ``start_scale`` controls how much the pyramid may reshape
    the edit (lower = more freedom). ``key=None`` runs the deterministic
    (zero-noise) path. ``mask`` (broadcastable to the finest shape, 1 =
    edited region) composites the harmonized pixels into the ORIGINAL
    outside the mask — completion keeps everything but the hole exact.
    """
        if not 0 <= start_scale < len(self.shapes):
            raise ValueError(f"start_scale must be in [0, "
                             f"{len(self.shapes) - 1}], got {start_scale}")
        x = jnp.asarray(image, jnp.float32)
        batched = x.ndim == 4
        if not batched:
            x = x[None]
        original = x
        x = x * 2.0 - 1.0                          # generator space [-1, 1]
        x = _resize(x, *self.shapes[start_scale])
        for s in range(start_scale, len(self.shapes)):
            x = _resize(x, *self.shapes[s])
            if key is not None:
                key, k = jax.random.split(key)
                z = self.noise_amps[s] * jax.random.normal(k, x.shape)
                x_in = x + z
            else:
                x_in = x
            x = x + self._gen.apply(self.gen_params[s], x_in)
        out = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
        if mask is not None:
            m = jnp.asarray(mask, jnp.float32)
            out = m * out + (1.0 - m) * original
        return out if batched else out[0]


def train_singan(image: jnp.ndarray, n_scales: int = 3,
                 steps_per_scale: int = 300, features: int = 32,
                 scale_factor: float = 0.5, min_size: int = 6,
                 lr: float = 5e-4, rec_weight: float = 10.0,
                 seed: int = 0) -> Tuple[SinGAN, Dict[str, Any]]:
    """Train a SinGAN pyramid on ONE image (uint8 or float [0,1] HWC).

    Returns (model, history) where history has per-scale final losses.
    """
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    img = img * 2.0 - 1.0                           # tanh range
    h, w, c = img.shape[-3], img.shape[-2], img.shape[-1]
    shapes = _pyramid_shapes(h, w, n_scales, scale_factor, min_size)
    reals = [_resize(img[None], hs, ws) for hs, ws in shapes]

    gen = _ConvStack(features=features, out_channels=c, final_act="tanh")
    dsc = _ConvStack(features=features, out_channels=1)
    root = jax.random.PRNGKey(seed)
    rec_z0 = jax.random.normal(jax.random.fold_in(root, 999),
                               (1, *shapes[0], c))

    gen_params: List[Any] = []
    noise_amps: List[float] = []
    history: Dict[str, Any] = {"scales": []}
    prev_rec = jnp.zeros_like(reals[0])             # recon-path input

    for s, (hs, ws) in enumerate(shapes):
        real = reals[s]
        prev_rec = _resize(prev_rec, hs, ws)
        # noise amplitude: RMSE of the upsampled reconstruction (paper §3)
        amp = 1.0 if s == 0 else float(
            jnp.sqrt(jnp.mean((real - prev_rec) ** 2)))
        z_rec = rec_z0 if s == 0 else jnp.zeros_like(real)

        k_init = jax.random.fold_in(root, s)
        g_vars = gen.init(k_init, real)
        d_vars = dsc.init(jax.random.fold_in(k_init, 1), real)
        g_tx, d_tx = optax.adam(lr, b1=0.5), optax.adam(lr, b1=0.5)
        g_opt, d_opt = g_tx.init(g_vars), d_tx.init(d_vars)

        def fake_fn(gp, z, prev):
            return prev + gen.apply(gp, prev + z)

        def d_loss(dp, gp, z, prev):
            fake = jax.lax.stop_gradient(fake_fn(gp, z, prev))
            return (jnp.mean((dsc.apply(dp, real) - 1.0) ** 2)
                    + jnp.mean(dsc.apply(dp, fake) ** 2))

        def g_loss(gp, dp, z, prev):
            adv = jnp.mean((dsc.apply(dp, fake_fn(gp, z, prev)) - 1.0) ** 2)
            rec = jnp.mean((fake_fn(gp, z_rec, prev_rec) - real) ** 2)
            return adv + rec_weight * rec, rec

        def step(carry, key):
            g_vars, d_vars, g_opt, d_opt = carry
            z = amp * jax.random.normal(key, real.shape)
            prev = prev_rec                          # single-image regime
            dg = jax.grad(d_loss)(d_vars, g_vars, z, prev)
            du, d_opt = d_tx.update(dg, d_opt)
            d_vars = optax.apply_updates(d_vars, du)
            (gl, rec), gg = jax.value_and_grad(g_loss, has_aux=True)(
                g_vars, d_vars, z, prev)
            gu, g_opt = g_tx.update(gg, g_opt)
            g_vars = optax.apply_updates(g_vars, gu)
            return (g_vars, d_vars, g_opt, d_opt), (gl, rec)

        keys = jax.random.split(jax.random.fold_in(root, 100 + s),
                                steps_per_scale)
        (g_vars, d_vars, _, _), (gls, recs) = jax.jit(
            lambda c, ks: jax.lax.scan(step, c, ks))(
            (g_vars, d_vars, g_opt, d_opt), keys)

        gen_params.append(g_vars)
        noise_amps.append(amp)
        history["scales"].append({
            "shape": (hs, ws), "noise_amp": amp,
            "g_loss_first": float(gls[0]), "g_loss_last": float(gls[-1]),
            "rec_first": float(recs[0]), "rec_last": float(recs[-1])})
        prev_rec = fake_fn(g_vars, z_rec, prev_rec)  # recon for next scale
        _logger.info("singan scale %d (%dx%d): rec %.4f -> %.4f",
                     s, hs, ws, float(recs[0]), float(recs[-1]))

    return SinGAN(gen_params, noise_amps, shapes, features, rec_z0,
                  channels=c), history


def distilled_singan_augmentation(image: jnp.ndarray, key,
                                  n_variants: int = 8,
                                  start_scale: Optional[int] = None,
                                  **train_kwargs) -> jnp.ndarray:
    """The reference stub's stated intent, working: distill a per-image
    SinGAN and synthesize ``n_variants`` augmentation variants in [0, 1]
    at the image's pyramid resolution (singan.py:56)."""
    model, _ = train_singan(image, **train_kwargs)
    if start_scale is None:
        start_scale = max(1, len(model.shapes) - 2)  # keep global layout
    return model.sample(key, n=n_variants, start_scale=start_scale)


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
