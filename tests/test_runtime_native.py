"""Native C++ IO runtime tests (built on demand; skipped without a compiler)."""
import numpy as np
import pytest

from deepcv_tpu.runtime import native_available, gather_batch, NativeBatchLoader

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libdeepcv_io.so not buildable here")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return (rng.integers(0, 256, (512, 8, 8, 3), dtype=np.uint8),
            rng.integers(0, 10, (512,)).astype(np.int64))


def test_gather_matches_numpy(data):
    images, _ = data
    idx = np.random.default_rng(1).permutation(512)[:64].astype(np.int64)
    out = gather_batch(images, idx)
    assert np.array_equal(out, images[idx])


def test_gather_into_preallocated(data):
    images, _ = data
    idx = np.arange(32, dtype=np.int64)
    out = np.empty((32, 8, 8, 3), np.uint8)
    ret = gather_batch(images, idx, out=out)
    assert ret is out and np.array_equal(out, images[:32])


def test_loader_epoch_coverage_and_determinism(data):
    images, targets = data
    loader = NativeBatchLoader(images, targets, batch_size=64, depth=2, seed=3)
    assert loader.steps_per_epoch == 8
    # one epoch covers each sample exactly once (shuffled without replacement)
    seen = []
    for _ in range(loader.steps_per_epoch):
        xs, ys = next(loader)
        assert xs.shape == (64, 8, 8, 3) and ys.shape == (64,)
        seen.append(ys)
    loader.close()
    # determinism across loaders with the same seed
    l2 = NativeBatchLoader(images, targets, batch_size=64, depth=2, seed=3)
    l3 = NativeBatchLoader(images, targets, batch_size=64, depth=2, seed=3)
    a, _ = next(l2)
    b, _ = next(l3)
    assert np.array_equal(a, b)
    l2.close()
    l3.close()


def test_loader_batch_matches_gather_semantics(data):
    """Loader batches must be real gathers from the source arrays."""
    images, targets = data
    loader = NativeBatchLoader(images, targets, batch_size=32, depth=2,
                               seed=0, shuffle=False)
    xs, ys = next(loader)
    assert np.array_equal(xs, images[:32])
    assert np.array_equal(ys, targets[:32])
    loader.close()


def test_loader_rejects_oversize_batch(data):
    images, targets = data
    with pytest.raises(RuntimeError):
        NativeBatchLoader(images, targets, batch_size=100000)
