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


@pytest.fixture(scope="module")
def trained_singan(structured_image):
    """ONE training shared by the reconstruction and diversity tests
    (two full trainings cost ~40s of this 1-core box's suite budget)."""
    return train_singan(structured_image, n_scales=2,
                        steps_per_scale=120, features=16, seed=0)


def test_singan_trains_and_reconstructs(structured_image, trained_singan):
    model, hist = trained_singan
    # adversarial+rec training must reduce reconstruction at every scale
    for s in hist["scales"]:
        assert s["rec_last"] < s["rec_first"]
        assert np.isfinite(s["g_loss_last"])
    rec = model.reconstruct()
    target = jnp.asarray(structured_image, jnp.float32) / 255.0
    assert rec.shape == (1, 16, 16, 3)
    assert float(jnp.abs(rec[0] - target).mean()) < 0.15


def test_singan_variants_are_diverse(structured_image, trained_singan):
    model, _ = trained_singan
    v = model.sample(jax.random.PRNGKey(1), n=3,
                     start_scale=max(1, len(model.shapes) - 2))
    assert v.shape == (3, 16, 16, 3)
    assert float(v.min()) >= 0.0 and float(v.max()) <= 1.0
    # variants differ from one another (noise injected at fine scales)...
    assert float(v.std(axis=0).mean()) > 1e-3
    # ...but keep the source image's statistics (not noise, not collapse)
    target = jnp.asarray(structured_image, jnp.float32) / 255.0
    assert float(jnp.abs(v - target[None]).mean()) < 0.35


def test_distilled_augmentation_api(structured_image):
    """Public one-call API: train-and-sample composition (cheap 2-step run;
    quality is asserted by the shared-fixture tests above)."""
    v = distilled_singan_augmentation(structured_image, jax.random.PRNGKey(2),
                                      n_variants=2, n_scales=2,
                                      steps_per_scale=2, features=8)
    assert v.shape == (2, 16, 16, 3)
    assert float(v.min()) >= 0.0 and float(v.max()) <= 1.0
