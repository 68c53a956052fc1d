"""Reptile meta-learning (reference README.md:167 'meta-learning
techniques' — a pure TODO there): episodic sampling, one-program
meta-steps, and fast adaptation to UNSEEN classes."""
import jax
import numpy as np
import pytest

from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.train.meta_learning import (adapt, episode_accuracy,
                                            reptile_train, sample_episodes)

N_WAY, K_SHOT, Q = 4, 5, 5


def _square_dataset(n_classes=12, per_class=24, size=12, seed=0):
    """Class c = bright square at grid position c (few-shot toy task:
    classes are spatially distinct, so adaptation must move CONV features,
    not just the head)."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(n_classes):
        r, col = divmod(c, 4)
        for _ in range(per_class):
            img = rng.normal(0.1, 0.05, (size, size, 3))
            rr, cc = 1 + r * 3, 1 + col * 3
            img[rr:rr + 3, cc:cc + 3] += rng.uniform(0.7, 1.0)
            xs.append(img)
            ys.append(c)
    order = rng.permutation(len(xs))
    return (np.asarray(xs, np.float32)[order],
            np.asarray(ys, np.int64)[order])


def _model():
    hp = {"act_fn": "relu",
          "architecture": [
              {"conv2d": {"kernel_size": [3, 3], "out_channels": 8,
                          "stride": 2}},
              {"conv2d": {"kernel_size": [3, 3], "out_channels": 8,
                          "stride": 2}},
              {"flatten": {}},
              {"fully_connected": {"out_features": N_WAY, "act_fn": None}}]}
    return DeepcvModule((12, 12, 3), hp)


def test_sample_episodes_shapes_relabels_and_validates():
    images, labels = _square_dataset(n_classes=6, per_class=12)
    rng = np.random.default_rng(0)
    sx, sy, qx, qy = sample_episodes(images, labels, n_way=N_WAY,
                                     k_shot=K_SHOT, q_queries=Q,
                                     n_episodes=3, rng=rng)
    assert sx.shape == (3, N_WAY * K_SHOT, 12, 12, 3)
    assert qx.shape == (3, N_WAY * Q, 12, 12, 3)
    # labels are episode-local 0..n_way-1, each exactly k_shot/q times
    for e in range(3):
        assert sorted(np.unique(sy[e])) == list(range(N_WAY))
        assert (np.bincount(sy[e]) == K_SHOT).all()
        assert (np.bincount(qy[e]) == Q).all()
    with pytest.raises(ValueError, match="need >= 10 classes"):
        sample_episodes(images, labels, n_way=10, k_shot=1, q_queries=1,
                        n_episodes=1, rng=rng)
    with pytest.raises(ValueError, match="episodes need"):
        sample_episodes(images, labels, n_way=2, k_shot=10, q_queries=10,
                        n_episodes=1, rng=rng)


def test_batch_stats_models_rejected():
    hp = {"act_fn": "relu",
          "architecture": [
              {"conv2d": {"kernel_size": [3, 3], "out_channels": 4,
                          "batch_norm": {}}},
              {"flatten": {}},
              {"fully_connected": {"out_features": N_WAY, "act_fn": None}}]}
    model = DeepcvModule((12, 12, 3), hp)
    images, labels = _square_dataset(n_classes=6, per_class=12)
    with pytest.raises(ValueError, match="few-shot BN failure"):
        reptile_train(model, images, labels, n_way=N_WAY, meta_steps=1)


def test_reptile_learns_to_adapt_to_unseen_classes():
    """The few-shot claim end to end: meta-trained params adapt to classes
    NEVER seen in meta-training better than a scratch init adapts, and far
    above 4-way chance."""
    images, labels = _square_dataset(n_classes=12, per_class=24, seed=1)
    train_mask = labels < 8
    model = _model()

    meta_vars, hist = reptile_train(
        model, images[train_mask], labels[train_mask],
        n_way=N_WAY, k_shot=K_SHOT, q_queries=Q,
        meta_steps=40, meta_batch=4, inner_steps=5, inner_lr=0.08,
        meta_lr=0.5, meta_lr_final=0.1, seed=0)
    assert len(hist["query_accuracy"]) == 40
    # meta-training improved within-distribution adapted accuracy
    assert (np.mean(hist["query_accuracy"][-5:])
            > np.mean(hist["query_accuracy"][:5]) + 0.1)

    # held-out classes 8..11: adapt and evaluate, meta vs scratch init
    test_mask = ~train_mask
    rng = np.random.default_rng(7)
    sx, sy, qx, qy = sample_episodes(images[test_mask], labels[test_mask],
                                     n_way=N_WAY, k_shot=K_SHOT, q_queries=Q,
                                     n_episodes=5, rng=rng)
    scratch_vars = model.init(jax.random.PRNGKey(42))
    meta_acc, scratch_acc = [], []
    for e in range(5):
        a = adapt(model, meta_vars, sx[e], sy[e], steps=5, lr=0.08)
        meta_acc.append(episode_accuracy(model, a, qx[e], qy[e]))
        s = adapt(model, scratch_vars, sx[e], sy[e], steps=5, lr=0.08)
        scratch_acc.append(episode_accuracy(model, s, qx[e], qy[e]))
    meta_m, scratch_m = float(np.mean(meta_acc)), float(np.mean(scratch_acc))
    assert meta_m > 0.45            # 4-way chance is 0.25
    assert meta_m >= scratch_m + 0.1, (meta_m, scratch_m)
