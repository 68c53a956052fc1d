"""SAMME AdaBoost (reference README.md:171 'boosting' — a pure TODO
there): weak learners trained on reweighted samples, alpha-weighted vote,
and the boosted ensemble beating its own first member."""
import numpy as np
import pytest

from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.train.boosting import BoostedEnsemble, adaboost_train

C = 3


def _cluster_dataset(n_per=120, size=8, noise=1.4, seed=0):
    """Three classes = bright patch at one of three positions, with enough
    pixel noise that an under-trained weak learner stays imperfect."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(C):
        for _ in range(n_per):
            img = rng.normal(0.0, noise, (size, size, 3))
            r = 1 + c * 2
            img[r:r + 2, 2:6] += 1.0
            xs.append(img)
            ys.append(c)
    order = rng.permutation(len(xs))
    return (np.asarray(xs, np.float32)[order],
            np.asarray(ys, np.int64)[order])


def _weak_model(size=8, batch_norm=False):
    conv = {"kernel_size": [3, 3], "out_channels": 4, "stride": 2}
    if batch_norm:
        conv = dict(conv, batch_norm={})
    hp = {"act_fn": "relu",
          "architecture": [
              {"conv2d": conv},
              {"flatten": {}},
              {"fully_connected": {"out_features": C, "act_fn": None}}]}
    return DeepcvModule((size, size, 3), hp)


def test_adaboost_improves_over_first_member():
    images, labels = _cluster_dataset()
    model = _weak_model()
    ens, hist = adaboost_train(model, images, labels, rounds=6,
                               num_classes=C, inner_steps=15,
                               batch_size=32, lr=0.03, seed=0)
    assert len(ens.members) == len(ens.alphas) == len(hist["err"])
    assert 1 <= len(ens.members) <= 6
    # every kept member votes positively (better than chance when weighted)
    assert all(a > 0 for a in ens.alphas)
    assert all(e < 1 - 1 / C for e in hist["err"])
    # the boosted vote on the train set beats the first weak member alone
    first = BoostedEnsemble(model, ens.members[:1], ens.alphas[:1], C)
    first_acc = first.accuracy(images, labels)
    vote_acc = hist["vote_accuracy"][-1]
    assert first_acc < 1.0, "weak learner must stay weak for this test"
    assert vote_acc >= first_acc + 0.01, (vote_acc, first_acc)
    # vote accuracy history matches a fresh ensemble evaluation
    assert vote_acc == pytest.approx(ens.accuracy(images, labels))
    # vote_scores mass per row sums to the total alpha mass
    votes = ens.vote_scores(images[:5])
    assert votes.shape == (5, C)
    np.testing.assert_allclose(votes.sum(-1), sum(ens.alphas), rtol=1e-5)


def test_adaboost_batch_stats_and_validation():
    images, labels = _cluster_dataset(n_per=40)
    ens, hist = adaboost_train(_weak_model(batch_norm=True), images, labels,
                               rounds=2, num_classes=C, inner_steps=15,
                               batch_size=32, seed=1)
    assert all("batch_stats" in m for m in ens.members)
    assert ens.predict(images[:7]).shape == (7,)
    with pytest.raises(ValueError, match="rounds"):
        adaboost_train(_weak_model(), images, labels, rounds=0)
    with pytest.raises(ValueError, match="alpha per member"):
        BoostedEnsemble(_weak_model(), [], [], C)
