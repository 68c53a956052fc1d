"""sklearn-facade tests (reference README TODO: scikit interface wrappers +
fine-tuning tooling, README.md:157 — never started in the reference)."""
import jax
import numpy as np
import pytest

from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.sklearn_api import DeepcvClassifier

MODEL_HP = {
    "act_fn": "relu",
    "batch_norm": {"momentum": 0.1},
    "architecture": [
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 16, "padding": 1}},
        {"conv2d": {"kernel_size": [3, 3], "out_channels": 16, "padding": 1}},
        {"flatten": {}},
        {"fully_connected": {"act_fn": None, "batch_norm": None}},
    ],
}


@pytest.fixture(scope="module")
def xy():
    raw = load_dataset("synthetic", n=192, image_shape=(8, 8, 3),
                       num_classes=4, seed=0)
    # non-contiguous string-free label vocabulary: sklearn protocol says
    # predict() must return ORIGINAL labels, not internal codes
    remap = np.array([3, 5, 7, 9])
    return np.asarray(raw.images), remap[np.asarray(raw.targets)]


def test_fit_predict_score(xy):
    X, y = xy
    est = DeepcvClassifier(model_hp=MODEL_HP, epochs=8, batch_size=32,
                           lr=3e-3, seed=1)
    est.fit(X, y)
    assert list(est.classes_) == [3, 5, 7, 9]
    proba = est.predict_proba(X[:32])
    assert proba.shape == (32, 4)
    assert np.allclose(proba.sum(axis=1), 1.0, atol=1e-5)
    pred = est.predict(X[:32])
    assert set(pred) <= {3, 5, 7, 9}
    acc = est.score(X, y)
    assert acc > 0.6   # measured 0.89 on this seeded task; 0.25 is chance


def test_sklearn_protocol_roundtrip():
    est = DeepcvClassifier(epochs=3, lr=1e-2)
    params = est.get_params()
    clone = DeepcvClassifier(**params)        # sklearn.clone() equivalent
    assert clone.get_params() == params
    est.set_params(epochs=7)
    assert est.epochs == 7
    with pytest.raises(ValueError, match="Invalid parameter"):
        est.set_params(nope=1)
    with pytest.raises(RuntimeError, match="not fitted"):
        est.predict(np.zeros((1, 8, 8, 3)))


def test_fine_tune_freeze_head_only(xy):
    X, y = xy
    est = DeepcvClassifier(model_hp=MODEL_HP, epochs=2, batch_size=32,
                           lr=3e-3, seed=2)
    est.fit(X[:128], y[:128])
    before = jax.tree_util.tree_map(np.asarray, est.variables_["params"])
    est.fine_tune(X[128:], y[128:], epochs=2,
                  freeze_params=r"^(?!.*fully_connected)")
    after = est.variables_["params"]

    def leaves_by_path(tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        return {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
                for p, v in flat}

    b, a = leaves_by_path(before), leaves_by_path(after)
    frozen = [k for k in b if "fully_connected" not in k]
    trained = [k for k in b if "fully_connected" in k]
    assert frozen and trained
    for k in frozen:
        assert np.array_equal(b[k], a[k]), f"frozen param {k} changed"
    assert any(not np.array_equal(b[k], a[k]) for k in trained), \
        "head params did not train"
    # labels outside the fitted vocabulary are rejected
    with pytest.raises(ValueError, match="not in classes_"):
        est.fine_tune(X[:8], np.full(8, 42))


def test_explicit_fine_tune_args_beat_ctor_hp(monkeypatch):
    """Merge order: base defaults < ctor hp < EXPLICIT fine_tune args.
    A user hp={'epochs': 50} must govern fit() but must NOT clobber
    fine_tune(epochs=2) — the 'small data' call the API is designed for."""
    import deepcv_tpu.train as train_mod

    captured = {}

    class _FakeState:
        params = {}
        batch_stats = None
        ema_params = None

    def fake_train(hp, model, losses, data, **kw):
        captured.clear()
        captured.update(hp)
        return _FakeState(), {"train": [], "valid": []}

    monkeypatch.setattr(train_mod, "train", fake_train)
    rng = np.random.default_rng(0)
    X = rng.integers(0, 255, (32, 8, 8, 3)).astype(np.uint8)
    y = np.tile([0, 1], 16)
    est = DeepcvClassifier(model_hp=MODEL_HP, epochs=9, lr=3e-3,
                           hp={"epochs": 50,
                               "optimizer_opts": {"lr": 0.5,
                                                  "weight_decay": 0.01}})
    est.fit(X, y)
    assert captured["epochs"] == 50                 # ctor hp beats defaults
    assert captured["optimizer_opts"]["lr"] == 0.5

    est.fine_tune(X, y, epochs=2, freeze_params="head")
    assert captured["epochs"] == 2                  # explicit arg beats hp
    assert captured["freeze_params"] == "head"
    # lr falls back to 0.1x base lr but PRESERVES other optimizer opts
    assert captured["optimizer_opts"]["lr"] == pytest.approx(3e-4)
    assert captured["optimizer_opts"]["weight_decay"] == 0.01
