"""Transform + augmentation tests, incl. PIL/torchvision golden fidelity
(BASELINE north star: per-transform output deviation <= 1e-5 for the
preprocessing recipes; PIL-quantized parity for the AugMix ops)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.data import transforms as T
from deepcv_tpu.data import augmentation as A

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def u8_batch():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def x(u8_batch):
    return jnp.asarray(u8_batch, jnp.float32) / 255.0


# ---------------------------------------------------------------- fidelity --

def test_to_tensor_normalize_match_torch(u8_batch):
    """The exact CIFAR preprocessing recipe (ToTensor + Normalize,
    parameters.yml:197-201) must match the torch reference computation to
    <= 1e-5 (torchvision itself is not installed in this image; ToTensor is
    x/255 and Normalize is (x-mean)/std — computed here with torch float32
    to cross-check rounding)."""
    import torch

    mean = [0.491, 0.482, 0.447]
    std = [0.247, 0.243, 0.261]
    ours = T.normalize(T.to_tensor(jnp.asarray(u8_batch)), mean, std)
    t = torch.from_numpy(u8_batch).to(torch.float32).div(255.0)
    ref = (t - torch.tensor(mean)) / torch.tensor(std)
    assert np.abs(np.asarray(ours) - ref.numpy()).max() <= 1e-5


def test_enhance_ops_match_pil_exactly(u8_batch):
    """The AugMix enhance ops replicate Pillow's blend semantics byte-exact
    (u8-level math, truncating store, integer L greyscale, half-up SMOOTH
    filter) -- <= 1 u8 level over the FULL image across factors, the single
    level only covering float32 truncation boundaries."""
    from PIL import Image, ImageEnhance

    pil = Image.fromarray(u8_batch[0])
    x1 = jnp.asarray(u8_batch[:1], jnp.float32) / 255.0

    for enhancer, ours_fn in [
        (ImageEnhance.Brightness, A.brightness_with_factor),
        (ImageEnhance.Contrast, A.contrast_with_factor),
        (ImageEnhance.Color, A.color_with_factor),
        (ImageEnhance.Sharpness, A.sharpness_with_factor),
    ]:
        for factor in (0.0, 0.3, 0.45173885683464876, 1.0, 1.7, 1.9):
            ref = np.asarray(enhancer(pil).enhance(factor)).astype(np.int32)
            ours = np.asarray(jnp.round(ours_fn(
                x1, jnp.asarray([factor]))[0] * 255)).astype(np.int32)
            assert np.abs(ours - ref).max() <= 1, (enhancer.__name__, factor)


def test_int_ops_match_pil_exactly(u8_batch):
    from PIL import Image, ImageOps

    pil = Image.fromarray(u8_batch[0])
    x1 = jnp.asarray(u8_batch[:1], jnp.float32) / 255.0
    eq = np.asarray(jnp.round(A.equalize(x1)[0] * 255)).astype(np.int32)
    assert np.array_equal(eq, np.asarray(ImageOps.equalize(pil)).astype(np.int32))
    ac = np.asarray(jnp.round(A.autocontrast(x1)[0] * 255)).astype(np.int32)
    assert np.abs(ac - np.asarray(ImageOps.autocontrast(pil)).astype(np.int32)).max() <= 1


def _pil_affine_ref(img, coeffs):
    from PIL import Image

    im = Image.fromarray(img)
    out = im.transform(im.size, Image.AFFINE, coeffs,
                       resample=Image.BILINEAR, fillcolor=0)
    return np.asarray(out).astype(np.int32)


def _ours_affine_u8(img, coeffs):
    a, b, c, d, e, f = coeffs
    x1 = jnp.asarray(img, jnp.float32)[None] / 255.0
    m = jnp.asarray([[[a, b, c], [d, e, f]]], jnp.float32)
    out = T.affine_transform(x1, m, pil_exact_u8=True)[0] * 255
    return np.asarray(jnp.round(out)).astype(np.int32)


def test_affine_matches_pil_full_image(u8_batch):
    """FULL-image PIL parity (no interior mask) for the geometric AugMix ops:
    <= 1 u8 level everywhere. The semantics (center-inside fill test,
    edge-clamped taps, truncating u8 store) are byte-exact vs Pillow; the
    residual 1-level allowance only covers float32-vs-double weight rounding
    at truncation boundaries."""
    rng = np.random.default_rng(3)
    img = u8_batch[0]
    h, w = img.shape[:2]
    theta = np.deg2rad(27.0)
    cos, sin = np.cos(theta), np.sin(theta)
    cx, cy = w / 2, h / 2
    cases = [
        ("rotate", (cos, -sin, -cos * cx + sin * cy + cx,
                    sin, cos, -sin * cx - cos * cy + cy)),
        ("shear_x", (1.0, 0.23, 0.0, 0.0, 1.0, 0.0)),
        ("shear_y", (1.0, 0.0, 0.0, -0.31, 1.0, 0.0)),
        ("translate_frac", (1.0, 0.0, 3.7, 0.0, 1.0, -2.2)),
    ]
    for t in range(4):  # randomized general affines, borders included
        g = rng.uniform(-1.2, 1.2, 6) * np.array([1, 1, w / 3, 1, 1, h / 3])
        cases.append((f"general_{t}", tuple(g)))
    for name, coeffs in cases:
        ref = _pil_affine_ref(img, coeffs)
        ours = _ours_affine_u8(img, coeffs)
        assert np.abs(ours - ref).max() <= 1, (name, np.abs(ours - ref).max())


def test_integer_translate_and_rot90_bit_exact(u8_batch):
    """Where interpolation weights are exact (integer translations, 90-degree
    rotations) the op is BIT-exact vs PIL, border/fill included."""
    img = u8_batch[0]
    h, w = img.shape[:2]
    for coeffs in [(1.0, 0.0, 5.0, 0.0, 1.0, -3.0),
                   (0.0, -1.0, h / 2 + w / 2, 1.0, 0.0, h / 2 - w / 2)]:
        assert np.array_equal(_ours_affine_u8(img, coeffs),
                              _pil_affine_ref(img, coeffs)), coeffs


def test_rotate_op_matches_pil_rotate(u8_batch):
    """A.rotate's matrix convention == PIL Image.rotate (counterclockwise,
    about the float center), full image <= 1 level."""
    from PIL import Image

    img = u8_batch[0]
    h, w = img.shape[:2]
    for deg in (30.0, -14.0, 90.0):
        ref = np.asarray(Image.fromarray(img).rotate(
            deg, resample=Image.BILINEAR)).astype(np.int32)
        theta = np.deg2rad(deg)
        cos, sin = np.cos(theta), np.sin(theta)
        m = T._center_affine(1, h, w, cos, -sin, sin, cos)
        x1 = jnp.asarray(img, jnp.float32)[None] / 255.0
        ours = np.asarray(jnp.round(T.affine_transform(
            x1, m, pil_exact_u8=True)[0] * 255)).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1, deg


# ---------------------------------------------------------------- behavior --

def test_random_crop_shape_and_content(x):
    out = T.random_crop(x, KEY, 12)
    assert out.shape == (2, 12, 12, 3)
    out_pad = T.random_crop(x, KEY, 16, padding=2)
    assert out_pad.shape == (2, 16, 16, 3)


def test_flips(x):
    always = T.random_horizontal_flip(x, KEY, p=1.0)
    assert np.allclose(np.asarray(always), np.asarray(x)[:, :, ::-1, :])
    never = T.random_vertical_flip(x, KEY, p=0.0)
    assert np.allclose(np.asarray(never), np.asarray(x))


def test_color_jitter_runs_jitted(x):
    f = jax.jit(lambda x, k: T.color_jitter(x, k, 0.2, 0.2, 0.2, 0.1))
    y = f(x, KEY)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_adjust_hue_identity_at_zero(x):
    y = T.adjust_hue(x, 0.0)
    assert np.abs(np.asarray(y) - np.asarray(x)).max() < 1e-5


def test_compose_with_keys(x):
    c = T.Compose([
        (T.normalize, {"mean": [0.5] * 3, "std": [0.5] * 3}),
        (T.random_horizontal_flip, {"p": 0.5}),
    ])
    y = c(x, KEY)
    assert y.shape == x.shape
    with pytest.raises(ValueError, match="PRNG key"):
        c(x)  # random step without key


def test_all_13_ops_jit_and_stay_in_range(x):
    for name, fn in A.AUGMENTATION_OPS.items():
        y = jax.jit(lambda xx, kk, fn=fn: fn(xx, kk, 3))(x, KEY)
        assert y.shape == x.shape, name
        ymin, ymax = float(y.min()), float(y.max())
        assert -1e-5 <= ymin and ymax <= 1.0 + 1e-5, (name, ymin, ymax)


def test_augment_and_mix_deterministic_and_bounded(x):
    f = jax.jit(lambda xx, kk: A.augment_and_mix(
        xx, kk, severity=3, width=2, depth=2,
        ops=("posterize", "solarize", "brightness")))
    y1 = f(x, KEY)
    y2 = f(x, KEY)
    assert np.allclose(np.asarray(y1), np.asarray(y2))
    y3 = f(x, jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    assert float(y1.min()) >= -1e-5 and float(y1.max()) <= 1 + 1e-5


def test_recipe_parser_reference_format(x):
    """Compile the reference basic_augmentation recipe (parameters.yml:151-167)."""
    recipe = {
        "keep_same_input_shape": True,
        "random_transform_order": True,
        "augmentation_ops_depth": [1, 4],
        "augmentations_per_image": [1, 3],
        "transforms": [
            {"crop": False},
            {"brightness": 0.2},
            {"contrast": 0.1},
            {"tweak_colors": 0.1},
            {"gamma": 0.05},
            {"posterize": 0.05},
            {"noise": 0.1},
            {"rotate": [-0.1, 0.1]},
            {"translate": 0.2},
            {"scale": 0.2},
            {"smooth_non_linear_deformation": False},
        ],
    }
    aug = A.apply_augmentation_recipe(recipe)
    assert "brightness" in aug.steps and "crop" not in aug.steps
    y = jax.jit(aug)(x, KEY)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_unknown_recipe_transform_raises():
    with pytest.raises(ValueError, match="Unknown augmentation transform"):
        A.apply_augmentation_recipe({"transforms": [{"not_a_transform": 0.4}]})


def test_recipe_flips():
    """Flips in the recipe namespace: severity == flip probability."""
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (16, 8, 8, 3)),
                    jnp.uint8)
    always = A.apply_augmentation_recipe(
        {"transforms": [{"random_horizontal_flip": 1.0}],
         "augmentation_ops_depth": [1, 1]})(x, KEY)
    assert bool((always == x[:, :, ::-1, :]).all())
    never = A.apply_augmentation_recipe(
        {"transforms": [{"vflip": 0}], "augmentation_ops_depth": [1, 1]})(x, KEY)
    assert bool((never == x).all())
    half = A.apply_augmentation_recipe(
        {"transforms": [{"hflip": 0.5}], "augmentation_ops_depth": [1, 1]})(
        x, jax.random.PRNGKey(3))
    frac = float((half == x[:, :, ::-1, :]).all(axis=(1, 2, 3)).mean())
    assert 0.2 <= frac <= 0.8


def test_mixup_and_cutmix_batch():
    """mixup: exact convex blend with the returned lam; CutMix: every output
    pixel equals one of the two sources and lam is the exact kept-area
    fraction."""
    import jax
    import jax.numpy as jnp
    from deepcv_tpu.data.augmentation import cutmix_batch, mixup_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 16, 3)), jnp.float32)

    xm, perm, lam = mixup_batch(x, jax.random.PRNGKey(1), alpha=0.4)
    assert xm.shape == x.shape and 0.5 <= float(lam) <= 1.0
    expect = lam * x + (1 - lam) * jnp.take(x, perm, axis=0)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(expect), rtol=1e-6)
    # the permutation is a permutation
    assert sorted(np.asarray(perm).tolist()) == list(range(8))

    xc, perm_c, lam_c = cutmix_batch(x, jax.random.PRNGKey(2), alpha=1.0)
    xp = jnp.take(x, perm_c, axis=0)
    from_a = np.isclose(np.asarray(xc), np.asarray(x)).all(axis=-1)
    from_b = np.isclose(np.asarray(xc), np.asarray(xp)).all(axis=-1)
    assert (from_a | from_b).all()
    # lam == exact kept fraction of ORIGINAL pixels (box may clip at edges)
    kept = from_a.mean()   # pixels equal to the original (ties overcount by ~0)
    assert abs(float(lam_c) - kept) < 0.02, (float(lam_c), kept)
    # both are jittable as-is
    jax.jit(lambda x, k: mixup_batch(x, k, 0.4))(x, jax.random.PRNGKey(3))
    jax.jit(lambda x, k: cutmix_batch(x, k, 1.0))(x, jax.random.PRNGKey(3))


def test_rand_augment_batch_per_image_selection():
    """RandAugment picks ONE op per image per round: with n=1 every output
    image must equal exactly one pool op applied to the input (true
    selection, not blending); a full recipe with rand_augment composes,
    jits, and pickles."""
    import pickle

    import jax
    import jax.numpy as jnp
    from deepcv_tpu.data.augmentation import (AUGMENTATION_OPS,
                                              apply_augmentation_recipe,
                                              rand_augment_batch)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 255, (6, 16, 16, 3)), jnp.float32) / 255.0
    key = jax.random.PRNGKey(3)
    names = list(AUGMENTATION_OPS)
    y = rand_augment_batch(x, key, n=1, magnitude=5.0)
    # reproduce the candidates with the SAME internal key schedule
    kr, ks, _ = jax.random.split(key, 3)
    cands = [np.asarray(AUGMENTATION_OPS[nm](x, jax.random.fold_in(kr, i), 5.0))
             for i, nm in enumerate(names)]
    y = np.asarray(y)
    for b in range(x.shape[0]):
        matches = [np.allclose(y[b], c[b], atol=1e-6) for c in cands]
        assert any(matches), f"image {b} matches no pool op"
    # composes through the recipe path + jit + pickle roundtrip
    rec = apply_augmentation_recipe(
        {"transforms": [{"brightness": 0.1}],
         "rand_augment": {"n": 2, "magnitude": 4}})
    out = jax.jit(rec)(x, jax.random.PRNGKey(9))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    rec2 = pickle.loads(pickle.dumps(rec))
    out2 = rec2(x, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_trivial_augment_is_one_full_magnitude_rand_augment_round():
    """TrivialAugment == rand_augment_batch(n=1, magnitude=10) exactly (same
    key schedule); the recipe key validates, composes, and is exclusive
    with rand_augment."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from deepcv_tpu.data.augmentation import (apply_augmentation_recipe,
                                              rand_augment_batch,
                                              trivial_augment_batch)

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 255, (4, 16, 16, 3)), jnp.float32) / 255.0
    key = jax.random.PRNGKey(11)
    np.testing.assert_array_equal(
        np.asarray(trivial_augment_batch(x, key, ops=["color", "solarize"])),
        np.asarray(rand_augment_batch(x, key, n=1, magnitude=10.0,
                                      ops=["color", "solarize"])))

    rec = apply_augmentation_recipe(
        {"transforms": [], "trivial_augment": {"ops": ["brightness", "color"]}})
    out = jax.jit(rec)(x, jax.random.PRNGKey(1))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())

    with _pytest.raises(ValueError, match="exclusive"):
        apply_augmentation_recipe(
            {"transforms": [], "trivial_augment": {},
             "rand_augment": {"n": 1}})
    with _pytest.raises(ValueError, match="tuning-free"):
        apply_augmentation_recipe(
            {"transforms": [], "trivial_augment": {"magnitude": 5}})
    with _pytest.raises(ValueError, match="unknown ops"):
        apply_augmentation_recipe(
            {"transforms": [], "trivial_augment": {"ops": ["nope"]}})


def test_recipe_scalar_forms():
    """'trivial_augment: true' (the natural spelling for a tuning-free
    method) means all-defaults; a non-mapping scalar fails with the
    expected form named, not an opaque TypeError."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from deepcv_tpu.data.augmentation import apply_augmentation_recipe

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 255, (2, 16, 16, 3)), jnp.float32) / 255.0
    rec = apply_augmentation_recipe({"transforms": [], "trivial_augment": True})
    out = jax.jit(rec)(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    rec2 = apply_augmentation_recipe({"transforms": [], "rand_augment": True})
    out2 = jax.jit(rec2)(x, jax.random.PRNGKey(0))
    assert out2.shape == x.shape
    with _pytest.raises(ValueError, match="expected a mapping"):
        apply_augmentation_recipe({"transforms": [], "trivial_augment": 3})


def test_random_erasing_batch():
    """Random Erasing: erased fraction tracks the scale range, p=0 is
    identity, constant-value mode fills exactly, recipe key composes and
    validates; jit-safe."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from deepcv_tpu.data.augmentation import (apply_augmentation_recipe,
                                              random_erasing_batch)

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0.4, 0.6, (8, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(3)

    out = jax.jit(lambda x, k: random_erasing_batch(
        x, k, p=1.0, value=0.0))(x, key)
    changed = np.asarray(jnp.any(out != x, axis=-1))        # (N, H, W)
    frac = changed.mean(axis=(1, 2))
    assert np.all(frac > 0.01) and np.all(frac < 0.45), frac
    # constant fill: every erased pixel is exactly the value
    assert float(jnp.abs(out[jnp.asarray(changed)]).max()) == 0.0
    # erased region is one solid rectangle: per image, the changed-row and
    # changed-col index sets are contiguous
    for i in range(8):
        rows = np.flatnonzero(changed[i].any(axis=1))
        cols = np.flatnonzero(changed[i].any(axis=0))
        assert np.array_equal(rows, np.arange(rows[0], rows[-1] + 1))
        assert np.array_equal(cols, np.arange(cols[0], cols[-1] + 1))

    np.testing.assert_array_equal(
        np.asarray(random_erasing_batch(x, key, p=0.0)), np.asarray(x))

    rec = apply_augmentation_recipe(
        {"transforms": [], "random_erasing": {"p": 1.0}})
    y = jax.jit(rec)(x, key)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    assert float(jnp.mean((y != x).any(-1).astype(jnp.float32))) > 0.01
    with _pytest.raises(ValueError, match="unknown keys"):
        apply_augmentation_recipe(
            {"transforms": [], "random_erasing": {"prob": 1.0}})
