"""Pallas kernel correctness (interpreter mode on CPU; compiled-path perf is
validated on real TPU — see fused_layer.supports docstring for measured
numbers: 3x3 64ch fwd 0.029ms Pallas vs 0.750ms XLA on v5e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.ops.pallas.fused_layer import (
    fused_conv2d_bias_act, _conv_ref, supports, PallasConv, _auto_batch_tile,
)
from deepcv_tpu.ops.pallas.fused_augment import fused_augment_normalize
from deepcv_tpu.data import transforms as T


def test_fused_conv_matches_xla():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    y_pl = fused_conv2d_bias_act(x, w, b, jax.nn.relu, 2, True)
    y_ref = _conv_ref(x, w, b, jax.nn.relu)
    assert float(jnp.abs(y_pl - y_ref).max()) < 1e-5


def test_fused_conv_custom_vjp_matches():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 8, 8)) * 0.1
    b = jnp.zeros((8,))
    g_pl = jax.grad(lambda w: jnp.sum(
        fused_conv2d_bias_act(x, w, b, jax.nn.relu, 2, True) ** 2))(w)
    g_ref = jax.grad(lambda w: jnp.sum(_conv_ref(x, w, b, jax.nn.relu) ** 2))(w)
    assert float(jnp.abs(g_pl - g_ref).max()) < 1e-3


def test_supports_gate():
    same3 = ((1, 1), (1, 1))
    assert supports((3, 3), (1, 1), same3, 4, 64, 64)
    assert not supports((3, 3), (2, 2), same3, 4, 64, 64)   # strided
    assert not supports((4, 4), (1, 1), same3, 4, 64, 64)   # even kernel
    assert not supports((3, 3), (1, 1), same3, 4, 8, 64)    # small cin
    assert not supports((3, 3), (1, 1), same3, 4, 64, 8)    # small cout
    assert not supports((3, 3), (1, 1), ((0, 0), (0, 0)), 4, 64, 64)  # valid pad


def test_auto_batch_tile_divides_and_bounded():
    tb = _auto_batch_tile(256, 32, 32, 64, 3, 3, 64, 2)
    assert 256 % tb == 0 and 1 <= tb <= 256


def test_pallas_conv_module_fallback_on_cpu(rng):
    """On CPU backend PallasConv silently uses the XLA path — same params."""
    m = PallasConv(features=16, kernel_size=(3, 3), act_fn=jax.nn.relu)
    x = jnp.ones((2, 8, 8, 8))
    v = m.init(rng, x)
    assert set(v["params"]) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (3, 3, 8, 16)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 16)
    assert float(y.min()) >= 0.0  # relu applied


def test_fused_augment_matches_transforms_chain():
    u8 = jax.random.randint(jax.random.PRNGKey(3), (4, 8, 8, 3), 0, 256, jnp.uint8)
    br = jnp.asarray([1.2, 1.0, 0.8, 1.1])
    ct = jnp.asarray([0.9, 1.0, 1.1, 1.0])
    st = jnp.asarray([1.3, 1.0, 0.7, 1.0])
    gm = jnp.asarray([1.1, 1.0, 0.9, 1.0])
    mean = [0.491, 0.482, 0.447]
    std = [0.247, 0.243, 0.261]
    out = fused_augment_normalize(u8, br, ct, st, gm, None, mean, std,
                                  batch_tile=2, interpret=True)
    ref = T.normalize(T.adjust_gamma(T.adjust_saturation(T.adjust_contrast(
        T.adjust_brightness(T.to_tensor(u8), br), ct), st), gm), mean, std)
    assert float(jnp.abs(out - ref).max()) <= 1e-5


def test_fused_augment_neutral_is_pure_preprocess():
    u8 = jax.random.randint(jax.random.PRNGKey(5), (2, 8, 8, 3), 0, 256, jnp.uint8)
    ones = jnp.ones((2,))
    mean = [0.5, 0.5, 0.5]
    std = [0.25, 0.25, 0.25]
    out = fused_augment_normalize(u8, ones, ones, ones, ones, None, mean, std,
                                  batch_tile=2, interpret=True)
    ref = T.normalize(T.to_tensor(u8), mean, std)
    assert float(jnp.abs(out - ref).max()) <= 1e-5


def test_fused_augment_batch_divisibility():
    u8 = jnp.zeros((6, 8, 8, 3), jnp.uint8)
    ones = jnp.ones((6,))
    with pytest.raises(ValueError, match="divisible"):
        fused_augment_normalize(u8, ones, ones, ones, ones, None,
                                [0.5] * 3, [0.25] * 3, batch_tile=4, interpret=True)
