"""SinGAN-based augmentation (reference parity: deepcv.meta.data.singan —
a stub in the reference too, singan.py:56: distill a per-image SinGAN to
synthesize augmentation variants).

Status: intentionally NOT implemented, matching the reference's own stub-ness
(SURVEY §2.3). The on-device AugMix pipeline (data.augmentation) covers the
augmentation-diversity use case; a TPU SinGAN would train per-image generator
pyramids — noted for a future round if generative augmentation is requested.
"""
from __future__ import annotations

__all__ = ["distilled_singan_augmentation"]


def distilled_singan_augmentation(*args, **kwargs):
    raise NotImplementedError(
        "SinGAN augmentation distillation is unimplemented (the reference's "
        "singan.py is a stub as well); use data.augmentation.augment_and_mix")
