"""SinGAN generative augmentation (working take on the reference stub,
singan.py:56)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.data.singan import train_singan, distilled_singan_augmentation


@pytest.fixture(scope="module")
def structured_image():
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([x / 15.0, y / 15.0, ((x // 4 + y // 4) % 2).astype(float)], -1)
    return (img * 255).astype(np.uint8)


def test_singan_trains_and_reconstructs(structured_image):
    model, hist = train_singan(structured_image, n_scales=2,
                               steps_per_scale=120, features=16, seed=0)
    # adversarial+rec training must reduce reconstruction at every scale
    for s in hist["scales"]:
        assert s["rec_last"] < s["rec_first"]
        assert np.isfinite(s["g_loss_last"])
    rec = model.reconstruct()
    target = jnp.asarray(structured_image, jnp.float32) / 255.0
    assert rec.shape == (1, 16, 16, 3)
    assert float(jnp.abs(rec[0] - target).mean()) < 0.15


def test_singan_variants_are_diverse(structured_image):
    v = distilled_singan_augmentation(structured_image, jax.random.PRNGKey(1),
                                      n_variants=3, n_scales=2,
                                      steps_per_scale=120, features=16)
    assert v.shape == (3, 16, 16, 3)
    assert float(v.min()) >= 0.0 and float(v.max()) <= 1.0
    # variants differ from one another (noise injected at fine scales)...
    assert float(v.std(axis=0).mean()) > 1e-3
    # ...but keep the source image's statistics (not noise, not collapse)
    target = jnp.asarray(structured_image, jnp.float32) / 255.0
    assert float(jnp.abs(v - target[None]).mean()) < 0.35
