import numpy as np
import pytest

from deepcv_tpu.hyperparams import (
    Hyperparameters, to_hyperparameters, merge_hyperparameters,
    HyperparamDomain, HyperparameterSpace, apply_dotted_overrides,
)


def test_with_defaults_required():
    hp = Hyperparameters({"a": 1})
    merged, missing = hp.with_defaults({"a": ..., "b": 2, "c": ...})
    assert merged["a"] == 1 and merged["b"] == 2
    assert missing == ["c"]


def test_to_hyperparameters_raises_on_missing():
    with pytest.raises(ValueError, match="required"):
        to_hyperparameters({"a": 1}, {"a": ..., "b": ...})
    hp, missing = to_hyperparameters({"a": 1, "b": 2}, {"a": ..., "b": ..., "c": 3})
    assert hp["c"] == 3 and not missing


def test_immutability_and_mapping():
    hp = Hyperparameters(a=1, b=2)
    assert dict(hp) == {"a": 1, "b": 2}
    assert len(hp) == 2
    with pytest.raises(TypeError):
        hp["a"] = 5  # Mapping, not MutableMapping


def test_merge_recursive():
    a = {"opt": {"lr": 1e-3, "wd": 1e-2}, "epochs": 2}
    b = {"opt": {"lr": 5e-4}}
    m = merge_hyperparameters(a, b)
    assert m["opt"]["lr"] == 5e-4 and m["opt"]["wd"] == 1e-2 and m["epochs"] == 2


def test_spec_hash_stable():
    h1 = Hyperparameters({"a": 1, "b": [1, 2]}).spec_hash()
    h2 = Hyperparameters({"b": [1, 2], "a": 1}).spec_hash()
    h3 = Hyperparameters({"a": 2, "b": [1, 2]}).spec_hash()
    assert h1 == h2 != h3


def test_domain_sampling():
    rng = np.random.default_rng(0)
    assert HyperparamDomain("choice", [1, 2, 3]).sample(rng) in (1, 2, 3)
    u = HyperparamDomain("uniform", [0.0, 0.5]).sample(rng)
    assert 0.0 <= u <= 0.5
    lu = HyperparamDomain("loguniform", [1e-6, 1e-2]).sample(rng)
    assert 1e-6 <= lu <= 1e-2
    ri = HyperparamDomain("randint", [2, 10]).sample(rng)
    assert 2 <= ri < 10 and isinstance(ri, int)


def test_space_nni_json_roundtrip(tmp_path):
    # shape parity with conf/base/nni_hp_search_spaces/*.json
    d = {
        "train_image_classifier.optimizer_opts.lr": {"_type": "uniform", "_value": [1e-6, 5e-3]},
        "model:dropout_prob": {"_type": "uniform", "_value": [0.0, 0.5]},
        "model:conv_size": {"_type": "choice", "_value": [3, 5]},
    }
    space = HyperparameterSpace.from_nni_json(d)
    assert len(space) == 3
    assert space.to_nni_json() == d
    sample = space.sample(np.random.default_rng(1))
    assert set(sample) == set(d)


def test_apply_dotted_overrides():
    hp = {"optimizer_opts": {"lr": 1e-3}, "epochs": 2}
    out = apply_dotted_overrides(hp, {"training:optimizer_opts.lr": 9e-4, "epochs": 5})
    assert out["optimizer_opts"]["lr"] == 9e-4 and out["epochs"] == 5
    assert hp["optimizer_opts"]["lr"] == 1e-3  # original untouched
