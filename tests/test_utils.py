import pytest

from deepcv_tpu.utils import (
    Registry, GLOBAL_REGISTRY, get_by_identifier, parse_slice, recursive_getattr,
    EventsHandler, set_seeds,
)


def test_registry_register_and_alias():
    r = Registry("t")
    r.register("foo", 42, aliases=("bar",))
    assert r["foo"] == 42
    assert r["bar"] == 42
    assert "foo" in r and "bar" in r and "baz" not in r
    with pytest.raises(KeyError):
        r["baz"]


def test_registry_decorator():
    r = Registry("t")

    @r.register("fn")
    def fn():
        return 1

    assert r["fn"] is fn


def test_get_by_identifier_registry_and_import():
    assert callable(get_by_identifier("relu"))
    # safe dotted import
    import jax.numpy as jnp
    assert get_by_identifier("jax.numpy.tanh") is jnp.tanh
    with pytest.raises(ValueError):
        get_by_identifier("os.system")
    with pytest.raises(ValueError):
        get_by_identifier("not_registered_name")


def test_parse_slice():
    assert parse_slice("1:3") == slice(1, 3)
    assert parse_slice("::2") == slice(None, None, 2)
    assert parse_slice(":-1") == slice(None, -1)
    assert parse_slice("2") == slice(2, 3)
    assert parse_slice("-1") == slice(-1, None)
    assert parse_slice(slice(0, 5)) == slice(0, 5)
    assert parse_slice("slice(1, 5)") == slice(1, 5)
    lst = list(range(10))
    assert lst[parse_slice("1:3")] == [1, 2]


def test_recursive_getattr():
    import jax
    assert recursive_getattr(jax, "numpy.tanh") is jax.numpy.tanh


def test_events_handler():
    ev = EventsHandler("epoch_completed")
    calls = []
    ev.on("epoch_completed", lambda **ctx: calls.append(ctx["n"]), every=2)
    for n in range(1, 5):
        ev.fire("epoch_completed", count=n, n=n)
    assert calls == [2, 4]
    with pytest.raises(KeyError):
        ev.on("nope", lambda: None)


def test_set_seeds_returns_key():
    k = set_seeds(123)
    assert k.shape == (2,) or k.dtype.name.startswith("key")
