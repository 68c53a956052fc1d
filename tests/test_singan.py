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


def test_singan_harmonize_and_completion(structured_image, trained_singan):
    """Editing/harmonization/completion by intermediate-scale injection
    (reference README.md:154 'image completion/reconstruction/...
    combination ... from SinGAN' — never started there)."""
    model, _ = trained_singan
    target = jnp.asarray(structured_image, jnp.float32) / 255.0

    # injecting the TRAINING image keeps it near itself (the pyramid's
    # fixed point), while a random image is pulled TOWARD the learned
    # manifold: its harmonized output moves away from the input
    h_self = model.harmonize(target, start_scale=1)
    assert h_self.shape == target.shape
    assert float(jnp.abs(h_self - target).mean()) < 0.2
    rng = np.random.default_rng(0)
    noise_img = jnp.asarray(rng.uniform(0, 1, target.shape), jnp.float32)
    h_noise = model.harmonize(noise_img, start_scale=1)
    moved_noise = float(jnp.abs(h_noise - noise_img).mean())
    moved_self = float(jnp.abs(h_self - target).mean())
    assert moved_noise > moved_self

    # completion: naive paste + mask -> outside the mask EXACT, inside
    # re-rendered (differs from the paste), everything in range
    edited = target.at[4:9, 4:9, :].set(jnp.asarray([1.0, 0.0, 0.0]))
    mask = jnp.zeros((16, 16, 1)).at[4:9, 4:9].set(1.0)
    out = model.harmonize(edited, start_scale=1, mask=mask)
    np.testing.assert_allclose(np.asarray(out * (1 - mask)),
                               np.asarray(edited * (1 - mask)), atol=1e-6)
    inside = float(jnp.abs((out - edited) * mask).sum() / mask.sum())
    assert inside > 0.01                   # the paste was re-rendered
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    # batched + stochastic path and validation
    b = model.harmonize(jnp.stack([target, edited]),
                        key=jax.random.PRNGKey(3), start_scale=1)
    assert b.shape == (2, 16, 16, 3)
    with pytest.raises(ValueError, match="start_scale"):
        model.harmonize(target, start_scale=99)


def test_distilled_augmentation_api(structured_image):
    """Public one-call API: train-and-sample composition (cheap 2-step run;
    quality is asserted by the shared-fixture tests above)."""
    v = distilled_singan_augmentation(structured_image, jax.random.PRNGKey(2),
                                      n_variants=2, n_scales=2,
                                      steps_per_scale=2, features=8)
    assert v.shape == (2, 16, 16, 3)
    assert float(v.min()) >= 0.0 and float(v.max()) <= 1.0
