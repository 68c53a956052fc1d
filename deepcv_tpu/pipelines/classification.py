"""Image-classification task pipelines.

Reference parity: /root/reference/src/deepcv/classification/image.py —
``get_pipelines`` (:28-37: preprocess + train pipelines), ``create_model``
(:40-53: input shape from the trainset, classifier width from dataset
classes), ``train`` (:64-80: BackendConfig from hp, CrossEntropyLoss, AdamW,
Accuracy -> ignite train).
"""
from __future__ import annotations

import copy
import logging
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp

from deepcv_tpu.pipelines.framework import Node, Pipeline, \
    preprocess_node as preprocess
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.train import train as train_fn
from deepcv_tpu.train.backend import BackendConfig
from deepcv_tpu.train.losses import cross_entropy_loss
from deepcv_tpu.train.metrics import accuracy

__all__ = ["get_pipelines", "create_model", "train"]

_logger = logging.getLogger(__name__)


def create_model(datasets: Mapping[str, Any], model_params: Mapping[str, Any]
                 ) -> DeepcvModule:
    """Build the classifier from its YAML spec; the final ``fully_connected``
    width is injected from the dataset's class count
    (reference classification/image.py:40-53)."""
    trainset = datasets["trainset"]
    input_shape = trainset.image_shape
    num_classes = trainset.num_classes
    hp = copy.deepcopy(dict(model_params))
    zoo = hp.pop("zoo", None)
    if zoo:
        # programmatic zoo builders (spec/zoo.py): e.g.
        #   resnet50_model: { zoo: resnet, depth: 50 }
        # remaining keys override builder kwargs; input size sets the
        # global-pool window
        from deepcv_tpu.spec.zoo import mobilenet_v2_spec, resnet_spec
        pool = max(1, input_shape[0] // 32)   # global-pool window per family
        # kwargs belonging to OTHER builders must fail loudly, not ride
        # silently into the spec dict as inert keys
        def _reject(*keys):
            bad = [k for k in keys if k in hp]
            if bad:
                raise ValueError(f"zoo '{zoo}' does not accept {bad}")
        if str(zoo) == "mobilenet_v2":
            _reject("depth", "variant", "window", "groups", "width_per_group")
            built = mobilenet_v2_spec(
                num_classes=num_classes or 1000,
                width_mult=float(hp.pop("width_mult", 1.0)),
                norm=hp.pop("norm", "batch_norm"),
                pool_kernel=pool)
        elif str(zoo) == "efficientnet_b0":
            _reject("depth", "width_mult", "variant", "window", "groups", "width_per_group")
            from deepcv_tpu.spec.zoo import efficientnet_b0_spec
            built = efficientnet_b0_spec(
                num_classes=num_classes or 1000,
                norm=hp.pop("norm", "batch_norm"),
                pool_kernel=pool)
        elif str(zoo) == "mobilenet_v3":
            _reject("depth", "window", "groups", "width_per_group")
            from deepcv_tpu.spec.zoo import mobilenet_v3_spec
            built = mobilenet_v3_spec(
                variant=str(hp.pop("variant", "large")),
                num_classes=num_classes or 1000,
                width_mult=float(hp.pop("width_mult", 1.0)),
                norm=hp.pop("norm", "batch_norm"),
                pool_kernel=pool)
        elif str(zoo) == "densenet":
            _reject("width_mult", "variant", "window", "groups",
                    "width_per_group")
            from deepcv_tpu.spec.zoo import densenet_spec
            built = densenet_spec(depth=int(hp.pop("depth", 121)),
                                  num_classes=num_classes or 1000,
                                  norm=hp.pop("norm", "batch_norm"),
                                  pool_kernel=pool)
        elif str(zoo) == "convnext":
            _reject("depth", "width_mult", "norm", "window", "groups", "width_per_group")
            from deepcv_tpu.spec.zoo import convnext_spec
            built = convnext_spec(
                variant=str(hp.pop("variant", "tiny")),
                num_classes=num_classes or 1000,
                stochastic_depth=float(hp.pop("stochastic_depth", 0.1)),
                pool_kernel=pool)
        elif str(zoo) == "swin":
            _reject("depth", "width_mult", "norm", "groups", "width_per_group")
            from deepcv_tpu.spec.zoo import swin_spec
            built = swin_spec(
                variant=str(hp.pop("variant", "t")),
                num_classes=num_classes or 1000,
                window=int(hp.pop("window", 7)),
                stochastic_depth=float(hp.pop("stochastic_depth", 0.2)),
                pool_kernel=pool)
        elif str(zoo) == "vit":
            _reject("depth", "width_mult", "norm", "window", "groups", "width_per_group")
            from deepcv_tpu.spec.zoo import vit_spec
            built = vit_spec(variant=str(hp.pop("variant", "b_16")),
                             num_classes=num_classes or 1000,
                             dropout=float(hp.pop("dropout", 0.0)),
                             attn_dropout=float(hp.pop("attn_dropout", 0.0)),
                             stochastic_depth=float(
                                 hp.pop("stochastic_depth", 0.0)),
                             attn_impl=str(hp.pop("attn_impl", "xla")))
        elif str(zoo) == "resnet":
            _reject("width_mult", "variant", "window")
            built = resnet_spec(depth=int(hp.pop("depth", 50)),
                                num_classes=num_classes or 1000,
                                norm=hp.pop("norm", "batch_norm"),
                                groups=int(hp.pop("groups", 1)),
                                width_per_group=int(
                                    hp.pop("width_per_group", 64)),
                                pool_kernel=pool)
        else:
            raise ValueError(
                f"Unknown zoo builder '{zoo}' (known: resnet, mobilenet_v2, "
                "mobilenet_v3, efficientnet_b0, densenet, convnext, swin, vit)")
        built.update(hp)          # user overrides (act_fn, weight_norm, ...)
        hp = built
    arch = hp.get("architecture", [])
    if arch is None or not isinstance(arch, (list, tuple)):
        # an empty/nulled --params override must be a NAMED error at the
        # config boundary (r4 verdict #8: `--params ...architecture:` used
        # to surface as a downstream "'NoneType' object is not iterable")
        from deepcv_tpu.config import ConfigError
        raise ConfigError(
            "model hp 'architecture' must be a list of layer entries, got "
            f"{type(arch).__name__} ({arch!r}) — check your --params "
            "override or parameters.yml")
    _inject_out_features(arch, num_classes)
    dtype = hp.pop("dtype", None)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    # 'quantize: int8_qat' in the model conf turns the training pipeline
    # into quantization-aware training (fake-quant STE, compression.py);
    # 'int8' builds the inference-only w8a8 graph
    quantize = hp.pop("quantize", None)
    model = DeepcvModule(input_shape, hp, dtype=dtype, quantize=quantize)
    _logger.info("created model: %s", model)
    return model


def _inject_out_features(arch, num_classes: int) -> bool:
    """Set ``out_features`` on the LAST fully_connected entry (recursing into
    nested modules) if unset."""
    for entry in reversed(list(arch)):
        if not isinstance(entry, Mapping):
            continue
        for key, val in entry.items():
            if key in ("fully_connected", "linear"):
                params = val[1] if isinstance(val, (list, tuple)) else val
                if params.get("out_features") is None:
                    params["out_features"] = int(num_classes)
                return True
            if str(key).startswith("_nested"):
                sub = val.get("architecture") if isinstance(val, Mapping) else val
                if sub and _inject_out_features(sub, num_classes):
                    return True
    return False


def train(datasets, model: DeepcvModule, hp: Mapping[str, Any], trackers=()):
    """Training node (reference classification/image.py:64-80)."""
    backend = BackendConfig(**dict(hp.get("backend_conf") or {}))
    state, history = train_fn(hp, model, cross_entropy_loss, datasets,
                              backend_conf=backend,
                              metrics={"accuracy": accuracy},
                              loggers=list(trackers))
    return {"state": state, "history": history, "model": model}


def get_pipelines() -> Dict[str, Pipeline]:
    """Pipeline registry for this package (reference image.py:28-37)."""
    def preprocess_pipeline(ds: str, params_key: str) -> Pipeline:
        return Pipeline([
            Node(preprocess, [f"{ds}_train", f"{ds}_test", f"params:{params_key}"],
                 "datasets", name=f"preprocess_{ds}"),
        ], name=f"preprocess_{ds}", tags={"preprocess"})

    def train_pipeline(name: str, model_key: str, training_key: str,
                       ds: str = "cifar10", pp_key: str = None) -> Pipeline:
        return Pipeline([
            Node(preprocess, [f"{ds}_train", f"{ds}_test",
                              f"params:{pp_key or ds + '_preprocessing'}"],
                 "datasets", name="preprocess", tags=("preprocess",)),
            Node(create_model, ["datasets", f"params:{model_key}"],
                 "model", name="create_model", tags=("model",)),
            Node(train, ["datasets", "model", f"params:{training_key}",
                         "trackers"],
                 "train_results", name="train", tags=("train",)),
        ], name=name, tags={"train", "classification"})

    return {
        "preprocess_cifar10": preprocess_pipeline("cifar10", "cifar10_preprocessing"),
        "preprocess_cifar100": preprocess_pipeline("cifar100", "cifar100_preprocessing"),
        "preprocess_mnist": preprocess_pipeline("mnist", "mnist_preprocessing"),
        "train_image_classifier": train_pipeline(
            "train_image_classifier", "image_classifier_model",
            "train_image_classifier"),
        "train_image_classifier_cifar100": train_pipeline(
            "train_image_classifier_cifar100", "image_classifier_model",
            "train_image_classifier", ds="cifar100"),
        # the non-toy zoo model on CIFAR-10 (the shape bench.py --config 6
        # reports MFU for) + its group-norm and weight-standardized variants
        # (docs/design.md 5.9: activation-norm traffic vs weight-space norm)
        "train_wide_classifier": train_pipeline(
            "train_wide_classifier", "wide_classifier_model",
            "train_wide_classifier"),
        "train_wide_classifier_ws": train_pipeline(
            "train_wide_classifier_ws", "wide_classifier_ws_model",
            "train_wide_classifier"),
        "train_wide_classifier_gn": train_pipeline(
            "train_wide_classifier_gn", "wide_classifier_gn_model",
            "train_wide_classifier"),
        # canonical architecture via the programmatic zoo (spec/zoo.py)
        "train_resnet50": train_pipeline(
            "train_resnet50", "resnet50_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_mobilenet_v2": train_pipeline(
            "train_mobilenet_v2", "mobilenet_v2_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_mobilenet_v3": train_pipeline(
            "train_mobilenet_v3", "mobilenet_v3_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_vit": train_pipeline(
            "train_vit", "vit_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_convnext": train_pipeline(
            "train_convnext", "convnext_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_swin": train_pipeline(
            "train_swin", "swin_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
        "train_densenet": train_pipeline(
            "train_densenet", "densenet_model", "train_resnet50",
            ds="imagenet224", pp_key="imagenet224_preprocessing"),
    }
