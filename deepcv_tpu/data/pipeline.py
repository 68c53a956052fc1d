"""Input pipeline: host batching, device prefetch, device-resident datasets.

Replaces the reference's DataLoader workers + H2D prefetch monkey-patch
(/root/reference/src/deepcv/meta/data/datasets.py:76-115
``dataloader_prefetch_batches``) with two TPU-native paths:

  * :class:`BatchIterator` + :func:`prefetch_to_device` — streaming path:
    contiguous numpy slices, double-buffered ``jax.device_put`` so the next
    batch's H2D copy overlaps the current step's compute;
  * :class:`DeviceDataset` — resident path: the whole dataset lives in HBM
    (CIFAR-10 uint8 = 154 MB) and each step gathers its batch ON DEVICE inside
    the jitted train step. Zero per-step host work, zero H2D traffic — this is
    the >=10k img/s/chip path (BASELINE north star).

Multi-host: pass ``process_index``/``process_count`` to shard the index space
per host (DistributedSampler parity, reference ignite_training.py:260-262).
"""
from __future__ import annotations

import collections
import itertools
import logging
from typing import (Any, Callable, Dict, Iterator, Mapping, Optional,
                    Sequence, Tuple, Union)

import numpy as np
import jax
import jax.numpy as jnp

from deepcv_tpu.data.datasets import ArrayDataset
from deepcv_tpu.data.preprocess import PreprocessedDataset

__all__ = ["BatchIterator", "prefetch_to_device", "DeviceDataset"]

_logger = logging.getLogger(__name__)


def _unwrap(ds) -> ArrayDataset:
    return ds.dataset if isinstance(ds, PreprocessedDataset) else ds


class BatchIterator:
    """Epoch-aware shuffled batch iterator over an ArrayDataset.

    Yields host numpy ``(images, targets)`` batches of static shape
    (remainder dropped when ``drop_last``, else wrapped around — static
    shapes keep XLA from recompiling).
    """

    def __init__(self, dataset: Union[ArrayDataset, PreprocessedDataset],
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 shuffle_chunk: Optional[int] = None):
        self.data = _unwrap(dataset)
        self.batch_size = int(batch_size)   # PER-PROCESS batch
        self.shuffle = shuffle
        self.seed = int(seed)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        # memmap-backed data shuffles CHUNK-wise (shuffled chunk order +
        # within-chunk permutation): reads stay page-local instead of seeking
        # across the whole file for every batch
        if shuffle_chunk is None and isinstance(self.data.images, np.memmap):
            shuffle_chunk = max(self.batch_size, 8192)
        self.shuffle_chunk = shuffle_chunk
        # batch-major host split: host h's batch b is rows
        # [b*gbs + h*bs, b*gbs + (h+1)*bs) of the shared permutation, so the
        # ASSEMBLED global batch is identical on any process count — training
        # trajectories are topology-invariant, and every sample is assigned
        # exactly once (tail rows land in the final wrap-padded batch, where
        # validation masks them by per-host real counts)
        gbs = self.batch_size * process_count
        n = len(self.data)
        self.num_batches = n // gbs if drop_last else -(-n // gbs)
        if self.num_batches == 0:
            raise ValueError(f"Dataset ({n} items over {process_count} "
                             f"processes) smaller than one global batch ({gbs})")

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n_total = len(self.data)
        if self.shuffle and self.shuffle_chunk:
            rng = np.random.default_rng(self.seed + epoch)
            c = int(self.shuffle_chunk)
            starts = np.arange(0, n_total, c)
            order = np.concatenate(
                [s + rng.permutation(min(c, n_total - s))
                 for s in starts[rng.permutation(len(starts))]])
        elif self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            order = rng.permutation(n_total)
        else:
            order = np.arange(n_total)
        bs = self.batch_size
        gbs = bs * self.process_count
        for b in range(self.num_batches):
            start = b * gbs + self.process_index * bs
            idx = order[start:start + bs]
            if len(idx) < bs:  # wrap remainder to keep shapes static (tile:
                # a small dataset may not cover even one host batch)
                reps = -(-(bs - len(idx)) // len(order))
                idx = np.concatenate([idx] + [order] * reps)[:bs]
            yield self.data.images[idx], self.data.targets[idx]

    def __iter__(self):
        return self.epoch(0)

    def __len__(self):
        return self.num_batches


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       sharding: Optional[Any] = None,
                       wire_codec: Optional[Mapping[str, Any]] = None,
                       ) -> Iterator:
    """Double-buffered host->device transfer (reference
    ``dataloader_prefetch_batches`` non_blocking copies, datasets.py:76-115).

    ``jax.device_put`` is async; keeping ``size`` batches in flight overlaps
    the copy of batch k+1 with compute on batch k. ``sharding`` places each
    batch directly into its data-parallel layout (no host gather later).

    ``wire_codec`` (e.g. ``{"bits": 3, "axis": -2}``) compresses uint8
    leaves on the host->device wire and decodes them ON DEVICE
    (:mod:`deepcv_tpu.data.wirecodec`): on tunneled backends the streaming
    path is transfer-bound, and the delta+bitpack payload moves 2-3x fewer
    bytes for smooth imagery, falling back to raw per batch when the data
    is incompressible. Single-process only (the multihost assembly path
    needs the raw local rows).
    """
    queue = collections.deque()
    multihost = sharding is not None and jax.process_count() > 1

    def _put_one(a):
        if sharding is None:
            return jax.device_put(a)
        if multihost:
            # each process holds only ITS shard rows of the global batch;
            # assemble the global sharded array from per-process locals
            # (a plain device_put would treat every host's different local
            # batch as the same global array and drop most of the rows)
            return jax.make_array_from_process_local_data(sharding, a)
        return jax.device_put(a, sharding)

    use_codec = wire_codec is not None and not multihost
    if wire_codec is not None and multihost:
        # loud, not silent: the user asked for wire compression; shipping
        # raw without saying so would read as "the codec doesn't help"
        _logger.warning("wire_codec requested but disabled: the multi-host "
                        "global-batch assembly path needs the raw local "
                        "rows (process_count=%d)", jax.process_count())

    def _put_maybe_coded(a):
        a = np.asarray(a)
        if use_codec and a.dtype == np.uint8 and a.ndim >= 2:
            from deepcv_tpu.data.wirecodec import device_decode, encode_u8
            payload = encode_u8(a, **dict(wire_codec))
            if payload is not None:
                return device_decode(payload, sharding)
        return _put_one(a)

    def put(batch):
        return jax.tree_util.tree_map(_put_maybe_coded, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class DeviceDataset:
    """Whole dataset resident in device memory; per-step batch gather on chip.

    Usage::

        dd = DeviceDataset(trainset, batch_size=1024, sharding=s)
        def train_step(state, step, key):
            x, y = dd.batch_for_step(step, key)      # inside jit
            ...

    The gather (``images[idx]``) is an on-device dynamic-gather the TPU does
    at HBM bandwidth; augmentation/normalization fuse right after it. For a
    sharded mesh the arrays are replicated or batch-sharded per ``sharding``.
    """

    def __init__(self, dataset: Union[ArrayDataset, PreprocessedDataset],
                 batch_size: int, sharding: Optional[Any] = None):
        data = _unwrap(dataset)
        self.batch_size = int(batch_size)
        self.n = len(data)
        imgs, tgts = data.images, data.targets
        # Layout is item-size dependent (both regimes measured on v5e):
        #  * SMALL items (CIFAR-scale) store FLATTENED to (N, prod(item)):
        #    the TPU row gather tiles the minor dims, so NHWC uint8
        #    (..., 32, 3) pads the 3-channel lane dim to 128 and moves ~40x
        #    the bytes — 4.65ms vs 1.17ms for a CIFAR batch-4096 gather.
        #  * LARGE items (224x224x3 and up) keep their NATURAL shape: a flat
        #    row of 150528 u8 exceeds XLA's gather column chunking and the
        #    loop re-slices the FULL dataset every step (profiled: 3.6ms of
        #    dataset-sized copies per step vs 0.66ms for the 4-D gather,
        #    whose one re-layout copy hoists out of the scan).
        self.item_shape = tuple(int(s) for s in np.asarray(imgs).shape[1:])
        self._flat = int(np.prod(self.item_shape)) <= 16384
        imgs = np.asarray(imgs)
        if self._flat:
            imgs = imgs.reshape(self.n, -1)
        self.images = jax.device_put(imgs, sharding) if sharding is not None \
            else jnp.asarray(imgs)
        self.targets = jax.device_put(tgts, sharding) if sharding is not None \
            else jnp.asarray(tgts)
        self.steps_per_epoch = self.n // self.batch_size

    def _unflatten(self, rows: jnp.ndarray) -> jnp.ndarray:
        if not self._flat:
            return rows
        return rows.reshape(rows.shape[0], *self.item_shape)

    def batch_for_step(self, key, images=None, targets=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Uniform random batch (with-replacement across epochs; jit-safe).

        IMPORTANT: inside a jitted step, pass ``images``/``targets`` as jit
        ARGUMENTS (``jit_step(state, dd.images, dd.targets)``) — capturing the
        device-resident arrays as closure constants makes XLA embed/hash the
        whole dataset at compile time (~170s for CIFAR-sized arrays).
        """
        images = self.images if images is None else images
        targets = self.targets if targets is None else targets
        idx = jax.random.randint(key, (self.batch_size,), 0, self.n)
        return (self._unflatten(jnp.take(images, idx, axis=0)),
                jnp.take(targets, idx, axis=0))

    def batch_at(self, perm: jnp.ndarray, step: jnp.ndarray,
                 images=None, targets=None):
        """Batch ``step`` of a precomputed permutation (exact epoch semantics)."""
        images = self.images if images is None else images
        targets = self.targets if targets is None else targets
        start = (step % self.steps_per_epoch) * self.batch_size
        idx = jax.lax.dynamic_slice_in_dim(perm, start, self.batch_size)
        return (self._unflatten(jnp.take(images, idx, axis=0)),
                jnp.take(targets, idx, axis=0))

    def epoch_permutation(self, key) -> jnp.ndarray:
        return jax.random.permutation(key, self.n)
