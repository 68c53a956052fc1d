"""Preprocessing node: splits, transform-spec parsing, dataset stats, wrapping.

Reference parity: /root/reference/src/deepcv/meta/data/preprocess.py —
``preprocess()`` (:218-260), ``_parse_transforms_specification`` (:137-178),
``_process_normalization_stats`` (:109-134, joblib-cached full-trainset scan),
``PreprocessedDataset`` (:35-63).

TPU-first: transforms compile to ONE batched function applied on device per
batch (inside or alongside the jitted train step), not per-item in workers.
Dataset stats are computed with a single pass on device and disk-cached.
"""
from __future__ import annotations

import hashlib
import logging
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from deepcv_tpu.hyperparams import to_hyperparameters
from deepcv_tpu.data import transforms as T
from deepcv_tpu.data.datasets import ArrayDataset, split_dataset
from deepcv_tpu.data.augmentation import apply_augmentation_recipe
from deepcv_tpu.utils import set_seeds

__all__ = ["preprocess", "PreprocessedDataset", "parse_transforms_specification",
           "process_normalization_stats", "PREPROCESS_DEFAULTS"]

_logger = logging.getLogger(__name__)

STATS_CACHE_DIR = Path("data/03_primary/stats_cache")

PREPROCESS_DEFAULTS = {
    "seed": 434546,
    "cache": False,
    "split_dataset": ...,          # {'validset_ratio': .., 'testset_ratio': ..}
    "transforms": ...,
    "target_transforms": None,
    "augmentation_recipe": None,
    "augmentation_reciepe": None,  # reference typo accepted as alias (SURVEY §8)
}


def process_normalization_stats(trainset: ArrayDataset,
                                cache_dir: Optional[Path] = None,
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std over the WHOLE trainset, computed on device in one
    pass and disk-cached (reference preprocess.py:109-134 scans per item with
    joblib caching — SURVEY hot-loop #3)."""
    cache_dir = Path(cache_dir or STATS_CACHE_DIR)
    # key includes a CONTENT fingerprint (sampled rows), not just
    # name/len/shape: every split_dataset output is named 'trainset', so two
    # different datasets with equal size+shape (e.g. CIFAR-10 and CIFAR-100
    # splits) would otherwise silently reuse each other's cached stats
    probe_idx = np.linspace(0, len(trainset) - 1, num=min(16, len(trainset)),
                            dtype=np.int64)
    probe = np.ascontiguousarray(
        np.stack([np.asarray(trainset.images[i]) for i in probe_idx]))
    key = hashlib.sha1(
        f"{trainset.name}_{len(trainset)}_{trainset.image_shape}_".encode()
        + probe.tobytes()).hexdigest()[:12]
    cache = cache_dir / f"stats_{key}.npz"
    if cache.exists():
        z = np.load(cache)
        return z["mean"], z["std"]
    imgs = trainset.images
    if isinstance(imgs, np.memmap) or imgs.nbytes > 512 * 1024 ** 2:
        # larger-than-RAM/HBM path: one sequential sweep in bounded chunks,
        # accumulating per-channel sum/sumsq in float64 on the host
        c = imgs.shape[-1]
        s = np.zeros((c,), np.float64)
        sq = np.zeros((c,), np.float64)
        count = 0
        for lo in range(0, len(imgs), 8192):
            chunk = np.asarray(imgs[lo:lo + 8192], np.float64)
            if imgs.dtype == np.uint8:
                chunk /= 255.0
            flat = chunk.reshape(-1, c)
            s += flat.sum(0)
            sq += (flat * flat).sum(0)
            count += flat.shape[0]
        mean = (s / count).astype(np.float32)
        std = np.sqrt(np.maximum(sq / count - (s / count) ** 2, 0.0)).astype(np.float32)
    else:
        x = jnp.asarray(imgs, dtype=jnp.float32)
        if imgs.dtype == np.uint8:
            x = x / 255.0
        axes = tuple(range(x.ndim - 1))
        mean = np.asarray(jnp.mean(x, axis=axes))
        std = np.asarray(jnp.std(x, axis=axes))
    cache_dir.mkdir(parents=True, exist_ok=True)
    np.savez(cache, mean=mean, std=std)
    return mean, std


def _resolve_transform_entry(entry: Any, trainset: Optional[ArrayDataset],
                             cache_dir: Optional[Path]):
    """Resolve one YAML transform entry to ``(fn, kwargs)``.

    Accepts: plain name str, ``{name: kwargs}``, TaggedFactory, or
    ``{TaggedFactory: kwargs}`` (the reference's
    ``!py!torchvision.transforms.Normalize "": {...}`` idiom).
    Runtime-computed args (reference TRANSFORM_ARGS_PROCESSORS registry,
    preprocess.py:89-106): ``normalize`` without mean/std gets dataset stats.
    """
    kwargs: Dict[str, Any] = {}
    if isinstance(entry, Mapping) and len(entry) == 1:
        (entry, kwargs), = entry.items()
        kwargs = dict(kwargs or {})
    if hasattr(entry, "resolve"):  # TaggedFactory
        kwargs = {**getattr(entry, "kwargs", {}), **kwargs}
        fn = entry.resolve()
    elif isinstance(entry, str):
        if entry not in T.TRANSFORM_REGISTRY:
            raise ValueError(f"Unknown transform '{entry}'; known: "
                             f"{sorted(T.TRANSFORM_REGISTRY)}")
        fn = T.TRANSFORM_REGISTRY[entry]
    elif callable(entry):
        fn = entry
    else:
        raise ValueError(f"Cannot parse transform spec entry: {entry!r}")

    if fn is T.normalize and ("mean" not in kwargs or "std" not in kwargs):
        if trainset is None:
            raise ValueError("normalize without mean/std requires a trainset "
                             "to compute stats from")
        mean, std = process_normalization_stats(trainset, cache_dir)
        kwargs.setdefault("mean", mean.tolist())
        kwargs.setdefault("std", std.tolist())
    return fn, kwargs


def parse_transforms_specification(specs: Sequence[Any],
                                   trainset: Optional[ArrayDataset] = None,
                                   cache_dir: Optional[Path] = None) -> T.Compose:
    """YAML transform list -> one batched :class:`Compose`
    (reference ``_parse_transforms_specification``, preprocess.py:137-178)."""
    entries = [_resolve_transform_entry(e, trainset, cache_dir) for e in (specs or [])]
    return T.Compose(entries)


class PreprocessedDataset:
    """Dataset + compiled batched transforms (+ optional augmentation).

    Equivalent of the reference wrapper applying per-item transforms in
    ``__getitem__`` (preprocess.py:35-63) — here ``batch_transform`` maps a
    whole device batch; the input pipeline (data.pipeline) feeds raw uint8
    batches and transformation happens on-chip.
    """

    def __init__(self, dataset: ArrayDataset, transform: Optional[T.Compose] = None,
                 target_transform: Optional[Callable] = None,
                 augmentation: Optional[Callable] = None):
        self.dataset = dataset
        self.transform = transform
        self.target_transform = target_transform
        self.augmentation = augmentation

    def __len__(self):
        return len(self.dataset)

    @property
    def classes(self):
        return self.dataset.classes

    @property
    def num_classes(self):
        return self.dataset.num_classes

    @property
    def image_shape(self):
        """Post-transform image shape (via eval_shape; zero FLOPs)."""
        raw = jnp.zeros((1, *self.dataset.image_shape),
                        dtype=self.dataset.images.dtype)
        out = jax.eval_shape(lambda x: self.batch_transform(x, augment=False), raw)
        return tuple(out.shape[1:])

    def batch_transform(self, images: jnp.ndarray, key=None,
                        augment: bool = True) -> jnp.ndarray:
        """uint8/float batch -> transformed float batch (device op)."""
        x = images
        if self.augmentation is not None and augment:
            if key is None:
                raise ValueError("augmentation requires a PRNG key")
            key, akey = jax.random.split(key)
            x = T.to_tensor(x)
            x = self.augmentation(x, akey)
        if self.transform is not None:
            x = self.transform(x, key)
        return x

    def transform_targets(self, targets):
        return self.target_transform(targets) if self.target_transform else targets

    def __repr__(self):
        return (f"PreprocessedDataset({self.dataset!r}, transform={self.transform}, "
                f"augment={self.augmentation is not None})")


def preprocess(datasets: Mapping[str, ArrayDataset], params: Mapping[str, Any],
               cache_dir: Optional[Path] = None) -> Dict[str, PreprocessedDataset]:
    """The preprocess pipeline node (reference preprocess.py:218-260):
    seed -> split -> parse transform specs -> optional augmentation recipe ->
    wrap. ``datasets`` holds 'trainset' (required) and optional 'testset'.
    """
    hp, _ = to_hyperparameters(dict(params), PREPROCESS_DEFAULTS)
    set_seeds(int(hp["seed"]))
    split_cfg = dict(hp["split_dataset"])
    splits = split_dataset(datasets["trainset"], datasets.get("testset"),
                           validset_ratio=float(split_cfg.get("validset_ratio", 0.2)),
                           testset_ratio=float(split_cfg.get("testset_ratio", 0.0)),
                           seed=int(hp["seed"]))
    transform = parse_transforms_specification(hp["transforms"],
                                               trainset=splits["trainset"],
                                               cache_dir=cache_dir)
    target_tf = None
    if hp.get("target_transforms"):
        target_tf = parse_transforms_specification(hp["target_transforms"])
    recipe = hp.get("augmentation_recipe") or hp.get("augmentation_reciepe")
    augmentation = apply_augmentation_recipe(recipe) if recipe else None
    out = {}
    for split_name, ds in splits.items():
        out[split_name] = PreprocessedDataset(
            ds, transform=transform, target_transform=target_tf,
            augmentation=augmentation if split_name == "trainset" else None)
    return out


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
