from pathlib import Path

import pytest

from deepcv_tpu.config import load_yaml, TaggedFactory, ConfigLoader

REFERENCE_PARAMS = Path("/root/reference/conf/base/parameters.yml")


def test_py_tags_become_factories():
    doc = load_yaml("""
act_fn: !py!torch.nn.ReLU
arch:
  - flatten: {}
""")
    assert isinstance(doc["act_fn"], TaggedFactory)
    assert doc["act_fn"].identifier == "torch.nn.ReLU"
    # resolves through reference-name alias table to our registered relu
    import jax
    assert doc["act_fn"].resolve() is not None


def test_tagged_key_with_kwargs():
    doc = load_yaml("""
transforms:
  - !py!torchvision.transforms.ToTensor
  - !py!torchvision.transforms.Normalize "": { mean: [0.49], std: [0.24] }
""")
    t0, t1 = doc["transforms"]
    assert isinstance(t0, TaggedFactory)
    # `!py!X "": {kwargs}` parses as {TaggedFactory: kwargs}
    assert isinstance(t1, dict)
    (k, v), = t1.items()
    assert isinstance(k, TaggedFactory) and v["mean"] == [0.49]


def test_loads_reference_parameters_yml_unchanged():
    """The reference's own parameter file must load with the safe loader."""
    if not REFERENCE_PARAMS.exists():
        pytest.skip("reference not mounted")
    doc = load_yaml(REFERENCE_PARAMS)
    assert "models" in doc and "train_image_classifier" in doc
    models = {k: v for d in doc["models"] for k, v in d.items()}
    assert "image_classifier" in models
    arch = models["basic_backbone"]["architecture"]
    assert any("conv2d" in e for e in arch if isinstance(e, dict))
    # anchors + merge keys resolved
    assert doc["train_image_classifier"]["epochs"] == 2
    assert doc["cifar10_preprocessing"]["split_dataset"]["validset_ratio"] == 0.2


def test_config_loader(tmp_path):
    (tmp_path / "parameters.yml").write_text("alpha: {beta: 3}\n")
    (tmp_path / "catalog.yml").write_text("ds1: {type: cifar10}\n")
    cl = ConfigLoader(tmp_path)
    assert cl.get("params:alpha.beta") == 3
    assert cl.get("alpha.beta") == 3
    assert cl.catalog["ds1"]["type"] == "cifar10"
    assert cl.get("missing.key", default=7) == 7
