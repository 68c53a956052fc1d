"""Datasets: array-backed datasets, loaders, splits, torch-dataset adapter.

Reference parity: /root/reference/src/deepcv/meta/data/datasets.py
(``PytorchDataset`` Kedro adapter :30-73, ``get_random_subset_dataloader``
:118-129) and ``split_dataset``
(/root/reference/src/deepcv/meta/data/preprocess.py:181-215).

TPU-first design: datasets are materialized ONCE into contiguous numpy
arrays (NHWC uint8 images + int labels). Vision datasets at DeepCV's scale
(CIFAR/MNIST/ImageNet-crops) stream best as large array slices — per-item
Dataset.__getitem__ churn (the reference's DataLoader worker model) is the
throughput bottleneck SURVEY flags as hot-loop #2.
"""
from __future__ import annotations

import hashlib
import inspect
import logging
import pickle
import zlib
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from deepcv_tpu.utils import get_by_identifier, register

__all__ = ["ArrayDataset", "load_dataset", "split_dataset", "get_random_subset",
           "TorchDatasetAdapter", "DATASET_LOADERS", "write_tar_shards",
           "tar_shards_to_memmap"]

_logger = logging.getLogger(__name__)

DEFAULT_DATA_ROOT = Path("data/01_raw")


class ArrayDataset:
    """In-memory dataset: images (N, H, W, C) uint8/float + targets (N, ...).

    ``classes`` carries label names for classifier-head sizing
    (reference create_model reads ``dataset.classes``,
    classification/image.py:40-53).
    """

    def __init__(self, images: np.ndarray, targets: np.ndarray,
                 classes: Optional[Sequence[str]] = None, name: str = "dataset",
                 provenance: str = "real"):
        if len(images) != len(targets):
            raise ValueError(f"images/targets length mismatch: {len(images)} vs {len(targets)}")
        self.images = images
        self.targets = targets
        self.classes = list(classes) if classes is not None else None
        self.name = name
        #: 'real' (on-disk pixels) or 'synthetic' (generated fallback) —
        #: surfaced in benchmark JSON so throughput claims disclose their data
        self.provenance = provenance

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return self.images[idx], self.targets[idx]

    @property
    def image_shape(self) -> Tuple[int, ...]:
        return tuple(self.images.shape[1:])

    @property
    def num_classes(self) -> Optional[int]:
        if self.classes is not None:
            return len(self.classes)
        if np.issubdtype(self.targets.dtype, np.integer):
            return int(self.targets.max()) + 1
        return None

    def subset(self, indices: np.ndarray, name: Optional[str] = None) -> "ArrayDataset":
        return ArrayDataset(self.images[indices], self.targets[indices],
                            classes=self.classes, name=name or f"{self.name}_subset",
                            provenance=self.provenance)

    def __repr__(self):
        return (f"ArrayDataset({self.name}, n={len(self)}, "
                f"image_shape={self.image_shape}, classes={self.num_classes})")


# --------------------------------------------------------------------------- #
# Built-in loaders (catalog parity: conf/base/catalog.yml CIFAR10/100 entries)
# --------------------------------------------------------------------------- #

DATASET_LOADERS: Dict[str, Callable] = {}


def _dataset_loader(name: str):
    def dec(fn):
        DATASET_LOADERS[name] = fn
        register(f"dataset:{name}", fn)
        return fn
    return dec


def _npz_cache(root: Path, key: str) -> Path:
    root.mkdir(parents=True, exist_ok=True)
    return root / f"{key}.npz"


#: canonical shapes for the synthetic fallback (no-egress environments)
_KNOWN_SHAPES = {
    "cifar10": ((32, 32, 3), 10, 50000, 10000),
    "cifar100": ((32, 32, 3), 100, 50000, 10000),
    "mnist": ((28, 28, 1), 10, 60000, 10000),
    "fashion_mnist": ((28, 28, 1), 10, 60000, 10000),
}


def _synthetic_like(name: str, train: bool) -> ArrayDataset:
    shape, ncls, ntrain, ntest = _KNOWN_SHAPES[name]
    n = ntrain if train else ntest
    # zlib.crc32, NOT hash(): Python's str hash is salted per process, which
    # would make the 'deterministic' fallback differ across machines/runs
    rng = np.random.default_rng(zlib.crc32(name.encode()) + (0 if train else 1))
    # structured synthetic images (class-dependent gradients + noise) so
    # accuracy is learnable and benchmarks exercise realistic entropy
    targets = rng.integers(0, ncls, size=(n,)).astype(np.int64)
    base = rng.integers(0, 256, size=(ncls, *shape), dtype=np.uint8)
    noise = rng.integers(0, 64, size=(n, *shape), dtype=np.uint8)
    images = np.clip(base[targets].astype(np.int16) + noise - 32, 0, 255).astype(np.uint8)
    return ArrayDataset(images, targets, classes=[str(i) for i in range(ncls)],
                        name=f"{name}_{'train' if train else 'test'}_synthetic",
                        provenance="synthetic")


# ------------------------- stdlib on-disk parsers --------------------------- #
# The reference loads CIFAR via torchvision (conf/base/catalog.yml:46-68,
# datasets.py:61-63); these formats need only stdlib pickle/gzip + numpy, so
# real pixels are usable in torchvision-free environments.

def _parse_cifar_pickle(name: str, root: Path, train: bool) -> Optional[ArrayDataset]:
    """Parse the canonical CIFAR python-pickle layout if present under root:
    ``cifar-10-batches-py/data_batch_{1..5}|test_batch`` or
    ``cifar-100-python/train|test`` (row-major CHW uint8 rows -> NHWC)."""
    if name == "cifar10":
        sub, files = "cifar-10-batches-py", (
            [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"])
        label_key, meta_file, names_key = b"labels", "batches.meta", b"label_names"
    else:
        sub, files = "cifar-100-python", (["train"] if train else ["test"])
        label_key, meta_file, names_key = b"fine_labels", "meta", b"fine_label_names"
    d = root / sub
    if not (d / files[0]).exists():
        d = root  # allow root to BE the extracted batches dir
        if not (d / files[0]).exists():
            return None
    xs, ys = [], []
    for f in files:
        with open(d / f, "rb") as fh:
            batch = pickle.load(fh, encoding="bytes")
        rows = np.asarray(batch[b"data"], np.uint8)
        xs.append(rows.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        ys.extend(batch[label_key])
    classes = None
    if (d / meta_file).exists():
        with open(d / meta_file, "rb") as fh:
            meta = pickle.load(fh, encoding="bytes")
        classes = [c.decode() for c in meta[names_key]]
    return ArrayDataset(np.ascontiguousarray(np.concatenate(xs)),
                        np.asarray(ys, np.int64), classes=classes,
                        name=f"{name}_{'train' if train else 'test'}")


def _read_idx(path: Path) -> np.ndarray:
    """Read an MNIST idx{1,3}-ubyte file (optionally gzipped): big-endian
    magic byte 4 = ndim, then ndim uint32 dims, then uint8 payload."""
    import gzip

    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        data = f.read()
    ndim = data[3]
    dims = [int.from_bytes(data[4 + 4 * i:8 + 4 * i], "big") for i in range(ndim)]
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def _parse_mnist_idx(name: str, root: Path, train: bool) -> Optional[ArrayDataset]:
    """Parse MNIST/FashionMNIST idx files if present under root (searched in
    the torchvision layouts ``<root>/<Name>/raw`` and root itself)."""
    prefix = "train" if train else "t10k"
    # search ONLY this dataset's canonical dirs: a shared torchvision root
    # holds both MNIST/raw and FashionMNIST/raw, and the two use identical
    # file names — a fixed search order would silently return digit pixels
    # for load_dataset('fashion_mnist')
    tv_dir = "MNIST" if name == "mnist" else "FashionMNIST"
    subdirs = [root / tv_dir / "raw", root / name, root / tv_dir, root / "raw",
               root]
    for d in subdirs:
        for ext in ("", ".gz"):
            img_p = d / f"{prefix}-images-idx3-ubyte{ext}"
            lbl_p = d / f"{prefix}-labels-idx1-ubyte{ext}"
            if img_p.exists() and lbl_p.exists():
                images = _read_idx(img_p)[..., None]  # (N, 28, 28, 1)
                targets = _read_idx(lbl_p).astype(np.int64)
                classes = ([str(i) for i in range(10)] if name == "mnist" else
                           ["T-shirt/top", "Trouser", "Pullover", "Dress", "Coat",
                            "Sandal", "Shirt", "Sneaker", "Bag", "Ankle boot"])
                return ArrayDataset(np.ascontiguousarray(images), targets,
                                    classes=classes,
                                    name=f"{name}_{'train' if train else 'test'}")
    return None


def _parse_local(name: str, root: Path, train: bool) -> Optional[ArrayDataset]:
    if name in ("cifar10", "cifar100"):
        return _parse_cifar_pickle(name, root, train)
    if name in ("mnist", "fashion_mnist"):
        return _parse_mnist_idx(name, root, train)
    return None  # pragma: no cover


def _load_builtin(name: str, root: Path, train: bool) -> ArrayDataset:
    """Load a real CIFAR/MNIST-family dataset, preferring torchvision-free
    paths, with an .npz materialization cache. Resolution order:

      1. the .npz cache from a previous load;
      2. stdlib parse of the canonical on-disk formats (pickle batches /
         idx-ubyte) — no torchvision needed when the files exist under root;
      3. torchvision download+decode, when importable and egress exists;
      4. a deterministic dataset-shaped SYNTHETIC fallback, clearly marked
         (name suffix ``_synthetic``, ``provenance='synthetic'``).
    """
    cache = _npz_cache(root, f"{name}_{'train' if train else 'test'}")
    if cache.exists():
        z = np.load(cache, allow_pickle=True)
        # classes=None round-trips through the cache as an empty array; map
        # it back to None so num_classes falls back to target inference
        # instead of len([]) == 0 (which would size a 0-unit classifier head)
        classes = list(z["classes"]) if "classes" in z else []
        return ArrayDataset(z["images"], z["targets"],
                            classes=classes or None,
                            name=f"{name}_{'train' if train else 'test'}")
    try:
        ds = _parse_local(name, root, train)
    except Exception as e:  # corrupt/truncated files: fall through
        _logger.warning("on-disk %s parse failed (%s)", name, e)
        ds = None
    if ds is not None:
        np.savez_compressed(cache, images=ds.images, targets=ds.targets,
                            classes=np.asarray(ds.classes or []))
        return ds
    try:
        import torchvision
        cls = {"cifar10": torchvision.datasets.CIFAR10,
               "cifar100": torchvision.datasets.CIFAR100,
               "mnist": torchvision.datasets.MNIST,
               "fashion_mnist": torchvision.datasets.FashionMNIST}[name]
        tvds = cls(root=str(root), train=train, download=True)
    except Exception as e:  # no torchvision / no network
        _logger.warning("Cannot load real %s (%s); using synthetic fallback", name, e)
        syn_cache = _npz_cache(root, f"{name}_{'train' if train else 'test'}_synthetic")
        if syn_cache.exists():
            z = np.load(syn_cache, allow_pickle=True)
            return ArrayDataset(z["images"], z["targets"], classes=list(z["classes"]),
                                name=f"{name}_{'train' if train else 'test'}_synthetic",
                                provenance="synthetic")
        ds = _synthetic_like(name, train)
        np.savez(syn_cache, images=ds.images, targets=ds.targets,
                 classes=np.asarray(ds.classes))
        return ds
    if hasattr(tvds, "data"):
        images = np.asarray(tvds.data)
        if images.ndim == 3:  # MNIST (N, H, W) -> (N, H, W, 1)
            images = images[..., None]
        targets = np.asarray(tvds.targets)
    else:  # pragma: no cover
        pairs = [(np.asarray(img), t) for img, t in tvds]
        images = np.stack([p[0] for p in pairs])
        targets = np.asarray([p[1] for p in pairs])
    classes = list(getattr(tvds, "classes", [])) or None
    np.savez_compressed(cache, images=images, targets=targets,
                        classes=np.asarray(classes if classes else []))
    return ArrayDataset(images.astype(np.uint8), targets, classes=classes,
                        name=f"{name}_{'train' if train else 'test'}")


for _n in ("cifar10", "cifar100", "mnist", "fashion_mnist"):
    _dataset_loader(_n)(lambda root=None, train=True, _n=_n, **kw:
                        _load_builtin(_n, Path(root or DEFAULT_DATA_ROOT), train))


@_dataset_loader("synthetic")
def _synthetic(root=None, train=True, n: int = 512, image_shape=(32, 32, 3),
               num_classes: int = 10, seed: int = 0, **kw) -> ArrayDataset:
    """Deterministic synthetic dataset for tests/benchmarks (no download)."""
    rng = np.random.default_rng(seed + (0 if train else 1))
    images = rng.integers(0, 256, size=(n, *image_shape), dtype=np.uint8)
    targets = rng.integers(0, num_classes, size=(n,)).astype(np.int32)
    return ArrayDataset(images, targets,
                        classes=[str(i) for i in range(num_classes)],
                        name=f"synthetic_{'train' if train else 'test'}",
                        provenance="synthetic")


@_dataset_loader("image_folder")
def _image_folder(root=None, train=True, image_size: int = 224,
                  extensions=(".png", ".jpg", ".jpeg", ".bmp"), **kw) -> ArrayDataset:
    """ImageNet-style directory dataset: ``root/<class_name>/*.jpg``
    (the catalog.yml ImageNet/custom entries the reference left commented).
    Decodes with PIL on the host, resizes to ``image_size`` squares,
    materializes to NHWC uint8."""
    from PIL import Image

    root = Path(root or DEFAULT_DATA_ROOT)
    if not root.exists():
        raise FileNotFoundError(f"image_folder root not found: {root}")
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    if not classes:
        raise ValueError(f"image_folder root has no class subdirectories: {root}")
    images, targets = [], []
    for ci, cname in enumerate(classes):
        for f in sorted((root / cname).iterdir()):
            if f.suffix.lower() not in extensions:
                continue
            img = Image.open(f).convert("RGB").resize((image_size, image_size),
                                                      Image.BILINEAR)
            images.append(np.asarray(img, np.uint8))
            targets.append(ci)
    if not images:
        raise ValueError(f"no images found under {root}")
    return ArrayDataset(np.stack(images), np.asarray(targets, np.int64),
                        classes=classes, name=f"image_folder_{root.name}")


@_dataset_loader("memmap")
def _memmap_dataset(root=None, train=True, images_path=None, targets_path=None,
                    classes=None, **kw) -> ArrayDataset:
    """Larger-than-RAM dataset over on-disk ``.npy`` files: images/targets
    open as ``np.memmap`` views, so only the pages each batch touches are
    ever read into memory. The training runtime keeps memmap datasets on the
    streaming path (never device-resident) and the batch iterator shuffles
    chunk-wise to keep reads sequential. Replaces the reference's lazy
    per-item DataLoader design (datasets.py:30-115) for ImageNet-scale
    catalog entries."""
    root = Path(root) if root else None
    images_path = Path(images_path) if images_path else (root / "images.npy")
    targets_path = Path(targets_path) if targets_path else (root / "targets.npy")
    images = np.load(images_path, mmap_mode="r")
    targets = np.load(targets_path, mmap_mode="r")
    return ArrayDataset(images, targets, classes=classes,
                        name=f"memmap_{images_path.stem}")


def materialize_image_folder_to_memmap(root, out_dir, image_size: int = 224,
                                       extensions=(".png", ".jpg", ".jpeg", ".bmp"),
                                       shuffle_seed: int = 0) -> ArrayDataset:
    """One-time conversion of an ``image_folder`` tree into memmap-backed
    ``.npy`` files, decoding incrementally so peak RSS stays at ~one image
    regardless of dataset size. Returns the opened memmap dataset.

    Rows are written in a seeded SHUFFLED order, not class order: memmap
    datasets split into contiguous zero-copy views (split_dataset), so a
    class-sorted file would put entire classes into the validset."""
    from PIL import Image
    from numpy.lib.format import open_memmap

    root, out_dir = Path(root), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    files = [(f, ci) for ci, cname in enumerate(classes)
             for f in sorted((root / cname).iterdir())
             if f.suffix.lower() in extensions]
    if not files:
        raise ValueError(f"no images found under {root}")
    rng = np.random.default_rng(shuffle_seed)
    files = [files[i] for i in rng.permutation(len(files))]
    images = open_memmap(out_dir / "images.npy", mode="w+", dtype=np.uint8,
                         shape=(len(files), image_size, image_size, 3))
    targets = open_memmap(out_dir / "targets.npy", mode="w+", dtype=np.int64,
                          shape=(len(files),))
    for i, (f, ci) in enumerate(files):
        img = Image.open(f).convert("RGB").resize((image_size, image_size),
                                                  Image.BILINEAR)
        images[i] = np.asarray(img, np.uint8)
        targets[i] = ci
    images.flush()
    targets.flush()
    (out_dir / "classes.txt").write_text("\n".join(classes))
    return _memmap_dataset(root=out_dir, classes=classes)


def write_tar_shards(dataset, out_dir, shard_size: int = 1024) -> list:
    """Export a dataset as webdataset-style TAR SHARDS: ``shard-%05d.tar``
    files whose members pair ``{idx:08d}.img.npy`` (uint8 NHWC image) with
    ``{idx:08d}.cls`` (ascii integer label). Tar shards are the standard
    interchange/ingest format for network-filesystem training corpora
    (sequential reads, rsync/object-store friendly, no tiny-file storms);
    stdlib ``tarfile`` only — no extra deps. Pre-existing shards in
    ``out_dir`` are removed first (a smaller re-export must not leave
    stale higher-numbered shards for the loaders to silently mix in).
    Images must be uint8 raw pixels — export BEFORE to_tensor/normalize
    (a silent float->uint8 cast would truncate [0,1] pixels to black).
    Returns the shard paths."""
    import io
    import tarfile

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for stale in list(out_dir.glob("shard-*.tar")) + \
            ([out_dir / "classes.txt"] if (out_dir / "classes.txt").exists()
             else []):
        stale.unlink()
    if np.asarray(dataset[0][0]).dtype != np.uint8:
        raise ValueError(
            "write_tar_shards stores uint8 raw pixels; got dtype "
            f"{np.asarray(dataset[0][0]).dtype} — export the RAW dataset "
            "(before to_tensor/normalize), not transformed floats")
    paths = []
    n = len(dataset)
    for s0 in range(0, n, int(shard_size)):
        p = out_dir / f"shard-{len(paths):05d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(s0, min(n, s0 + int(shard_size))):
                img, tgt = dataset[i]
                buf = io.BytesIO()
                np.save(buf, np.asarray(img, np.uint8))
                info = tarfile.TarInfo(f"{i:08d}.img.npy")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf.addfile(info, buf)
                cls = str(int(np.asarray(tgt).reshape(-1)[0])).encode()
                info = tarfile.TarInfo(f"{i:08d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
        paths.append(p)
    if getattr(dataset, "classes", None):
        (out_dir / "classes.txt").write_text("\n".join(dataset.classes))
    return paths


def _sorted_shards(shard_dir) -> list:
    """Shard files in NUMERIC order (lexicographic sorting breaks past
    99999 shards when the %05d field widens)."""
    shard_dir = Path(shard_dir)
    shards = sorted(shard_dir.glob("shard-*.tar"),
                    key=lambda p: int(p.stem.split("-", 1)[1]))
    if not shards:
        raise ValueError(f"no shard-*.tar files under {shard_dir}")
    return shards


def _count_shard_pairs(shards) -> int:
    """Complete img/cls PAIR count from the tar indexes only (no member
    data read) — orphaned members (truncated writes) are excluded so
    consumers never fabricate zero-filled rows."""
    import tarfile

    total = 0
    for sp in shards:
        stems_img, stems_cls = set(), set()
        with tarfile.open(sp, "r") as tf:
            for m in tf:
                stem, _, kind = m.name.partition(".")
                (stems_img if kind == "img.npy" else stems_cls).add(stem)
        orphans = stems_img ^ stems_cls
        if orphans:
            raise ValueError(f"{sp}: {len(orphans)} unpaired member(s) "
                             f"(e.g. {sorted(orphans)[:3]}) — truncated or "
                             "hand-built shard; re-export it")
        total += len(stems_img)
    return total


def _iter_tar_shards(shard_dir):
    """Yield (image uint8 array, int label) streaming through the shards
    sequentially (one member pair in memory at a time)."""
    import io
    import tarfile

    for sp in _sorted_shards(shard_dir):
        with tarfile.open(sp, "r") as tf:
            pending = {}
            for m in tf:
                stem, _, kind = m.name.partition(".")
                data = tf.extractfile(m).read()
                pending.setdefault(stem, {})[kind] = data
                entry = pending[stem]
                if "img.npy" in entry and "cls" in entry:
                    img = np.load(io.BytesIO(entry["img.npy"]))
                    yield img, int(entry["cls"].decode())
                    del pending[stem]


@_dataset_loader("tar_shards")
def _tar_shards_dataset(root=None, train=True, **kw) -> ArrayDataset:
    """Load webdataset-style tar shards (see :func:`write_tar_shards`) into
    an in-memory ArrayDataset — the ingest path for corpora that fit RAM
    (rows stream into ONE preallocated array; peak RSS ~ the dataset, not
    2x). For larger-than-RAM corpora convert once with
    :func:`tar_shards_to_memmap` and use the 'memmap' streaming loader."""
    if root is None:
        raise ValueError("the 'tar_shards' loader needs root=<shard dir> "
                         "(the directory write_tar_shards produced)")
    root = Path(root)
    shards = _sorted_shards(root)
    n = _count_shard_pairs(shards)
    it = _iter_tar_shards(root)
    first_img, first_cls = next(it)
    imgs = np.empty((n, *first_img.shape), first_img.dtype)
    tgts = np.empty((n,), np.int64)
    imgs[0], tgts[0] = first_img, first_cls
    for i, (img, cls) in enumerate(it, start=1):
        if img.shape != first_img.shape:
            raise ValueError(f"shard row {i}: image shape {img.shape} != "
                             f"{first_img.shape} (row 0) — mixed-shape "
                             "corpora are not loadable as one array")
        imgs[i], tgts[i] = img, cls
    classes = None
    if (root / "classes.txt").exists():
        classes = (root / "classes.txt").read_text().splitlines()
    return ArrayDataset(imgs, tgts, classes=classes,
                        name=f"tar_shards_{root.name}")


def tar_shards_to_memmap(shard_dir, out_dir) -> ArrayDataset:
    """One-time conversion of tar shards into the memmap streaming format
    (larger-than-RAM training): rows stream shard-by-shard into
    ``images.npy``/``targets.npy``, peak RSS ~ one image. The row count
    comes from a tar-index-only first pass (orphaned members rejected);
    a mid-conversion failure removes the partial files so a later
    'memmap' load can never open a half-written catalog."""
    from numpy.lib.format import open_memmap

    shard_dir, out_dir = Path(shard_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    shards = _sorted_shards(shard_dir)
    n = _count_shard_pairs(shards)
    it = _iter_tar_shards(shard_dir)
    first_img, first_cls = next(it)
    img_path, tgt_path = out_dir / "images.npy", out_dir / "targets.npy"
    try:
        images = open_memmap(img_path, mode="w+", dtype=np.uint8,
                             shape=(n, *first_img.shape))
        targets = open_memmap(tgt_path, mode="w+", dtype=np.int64,
                              shape=(n,))
        images[0], targets[0] = first_img, first_cls
        for i, (img, cls) in enumerate(it, start=1):
            if img.shape != first_img.shape:
                raise ValueError(f"shard row {i}: image shape {img.shape} "
                                 f"!= {first_img.shape} (row 0)")
            images[i], targets[i] = img, cls
        images.flush()
        targets.flush()
    except Exception:
        for p in (img_path, tgt_path):
            if p.exists():
                p.unlink()
        raise
    classes = None
    if (shard_dir / "classes.txt").exists():
        text = (shard_dir / "classes.txt").read_text()
        (out_dir / "classes.txt").write_text(text)
        classes = text.splitlines()
    return _memmap_dataset(root=out_dir, classes=classes)


def load_dataset(name_or_spec: Union[str, Mapping[str, Any]],
                 root: Optional[Union[str, Path]] = None, train: bool = True,
                 **kwargs) -> ArrayDataset:
    """Load a dataset by registered name or catalog-entry spec.

    Catalog-entry form (catalog.yml parity): ``{"type": <name-or-tag>,
    "dataset_kwargs": {...}}``.
    """
    if isinstance(name_or_spec, Mapping):
        spec = dict(name_or_spec)
        t = spec.pop("type", spec.pop("dataset", None))
        root = spec.pop("root", root)
        train = bool(spec.pop("train", train))
        # remaining top-level keys + explicit dataset_kwargs both pass through
        kwargs = {**spec.pop("dataset_kwargs", {}), **spec, **kwargs}
        ident = getattr(t, "identifier", t)
        name_or_spec = str(ident).rsplit(".", 1)[-1].lower()
    name = str(name_or_spec).lower()
    if name in DATASET_LOADERS:
        return DATASET_LOADERS[name](root=root, train=train, **kwargs)
    return TorchDatasetAdapter(name_or_spec, root=root, train=train, **kwargs).load()


class TorchDatasetAdapter:
    """Instantiate any torch ``Dataset`` by identifier and materialize it
    (reference ``PytorchDataset`` Kedro adapter, datasets.py:30-73, incl.
    ctor-signature kwarg validation)."""

    def __init__(self, identifier: Union[str, type], root=None, train: bool = True,
                 **dataset_kwargs):
        if isinstance(identifier, str):
            try:
                import torchvision  # allowlisted host-side import
            except ImportError as e:
                raise ImportError(
                    "TorchDatasetAdapter needs torchvision, which is not installed "
                    "in this environment; use a registered loader (load_dataset) "
                    "or pass arrays directly via ArrayDataset.") from e
            if identifier.startswith("torchvision.datasets."):
                identifier = getattr(torchvision.datasets, identifier.rsplit(".", 1)[-1])
            else:
                raise ValueError(
                    f"TorchDatasetAdapter only instantiates torchvision.datasets.* "
                    f"types by string (got '{identifier}'); pass the class directly "
                    f"otherwise.")
        self.dataset_type = identifier
        sig = inspect.signature(identifier.__init__)
        valid = set(sig.parameters) - {"self"}
        kwargs = dict(dataset_kwargs)
        if root is not None and "root" in valid:
            kwargs.setdefault("root", str(root))
        if "train" in valid:
            kwargs.setdefault("train", train)
        if "download" in valid:
            kwargs.setdefault("download", True)
        unknown = set(kwargs) - valid
        if unknown and "kwargs" not in sig.parameters:
            raise ValueError(f"Invalid kwargs for {identifier.__name__}: {sorted(unknown)}; "
                             f"ctor accepts {sorted(valid)}")
        self.kwargs = kwargs

    def load(self) -> ArrayDataset:
        ds = self.dataset_type(**self.kwargs)
        images, targets = [], []
        for img, t in ds:
            images.append(np.asarray(img))
            targets.append(t)
        images = np.stack(images)
        if images.ndim == 3:
            images = images[..., None]
        return ArrayDataset(images, np.asarray(targets),
                            classes=list(getattr(ds, "classes", [])) or None,
                            name=self.dataset_type.__name__.lower())


# --------------------------------------------------------------------------- #
# Splits & subsets
# --------------------------------------------------------------------------- #

def split_dataset(trainset: ArrayDataset, testset: Optional[ArrayDataset] = None,
                  validset_ratio: float = 0.2, testset_ratio: float = 0.0,
                  seed: int = 434546) -> Dict[str, ArrayDataset]:
    """Deterministic train/valid[/test] split by ratios
    (reference preprocess.py:181-215: testset_ratio ignored when a testset
    already exists).

    Memmap-backed datasets split by CONTIGUOUS ranges (slices of a memmap
    stay memmap views — a permutation gather would materialize the whole
    dataset in RAM); within-split shuffling happens chunk-wise in the batch
    iterator instead.
    """
    n = len(trainset)
    rng = np.random.default_rng(seed)
    mmap = isinstance(trainset.images, np.memmap)
    n_valid = int(round(validset_ratio * n))
    n_test = 0 if testset is not None else int(round(testset_ratio * n))
    out: Dict[str, ArrayDataset] = {}
    cursor = 0
    if mmap:
        def take(lo, hi):
            return slice(lo, hi)  # memmap slice = zero-copy view
    else:
        perm = rng.permutation(n)

        def take(lo, hi):
            return perm[lo:hi]
    if n_test:
        out["testset"] = trainset.subset(take(0, n_test), name="testset")
        cursor = n_test
    if testset is not None:
        out["testset"] = testset
    out["validset"] = trainset.subset(take(cursor, cursor + n_valid), name="validset")
    out["trainset"] = trainset.subset(take(cursor + n_valid, n), name="trainset")
    return out


def get_random_subset(dataset: ArrayDataset, size: Union[int, float],
                      seed: int = 0) -> ArrayDataset:
    """Random subset (reference ``get_random_subset_dataloader``,
    datasets.py:118-129) — used by generalization-across-scales prediction."""
    n = len(dataset)
    k = int(round(size * n)) if isinstance(size, float) and size <= 1.0 else int(size)
    rng = np.random.default_rng(seed)
    return dataset.subset(rng.permutation(n)[:k], name=f"{dataset.name}_sub{k}")


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)
