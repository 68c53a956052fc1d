"""Active learning (reference README TODO :152/:173 — uncertainty-driven
labeling, never started there). Covers the acquisition math on crafted
probability stacks and the full pool loop: uncertainty acquisition must
find the boundary samples a random labeler mostly misses."""
import numpy as np
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.data.datasets import ArrayDataset
from deepcv_tpu.data.preprocess import PreprocessedDataset, parse_transforms_specification
from deepcv_tpu.train.active_learning import (
    ACQUISITION_FNS, acquisition_scores, active_learning_loop,
    mc_class_probabilities)
from deepcv_tpu.train.losses import cross_entropy_loss

MODEL = """
act_fn: relu
dropout_prob: 0.1
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 2, act_fn: null }
"""


def test_acquisition_rankings():
    """confident < aleatoric (consistent 50/50) on entropy; BALD is blind to
    aleatoric noise but fires on MC disagreement (epistemic)."""
    confident = np.tile([[0.98, 0.02]], (4, 1))          # all samples agree, sure
    aleatoric = np.tile([[0.5, 0.5]], (4, 1))            # all samples agree, torn
    epistemic = np.array([[0.98, 0.02], [0.02, 0.98],    # samples disagree
                          [0.98, 0.02], [0.02, 0.98]])
    probs = np.stack([confident, aleatoric, epistemic], axis=1)  # (S=4, N=3, C=2)

    ent = acquisition_scores(probs, "entropy")
    assert ent[0] < ent[1] and ent[0] < ent[2]
    bald = acquisition_scores(probs, "bald")
    assert bald[2] > bald[1] + 0.3          # epistemic >> aleatoric
    assert abs(bald[1]) < 1e-6              # consistent 50/50: zero information
    margin = acquisition_scores(probs, "margin")
    assert margin[1] == pytest.approx(1.0) and margin[0] < 0.1
    vr = acquisition_scores(probs, "variation_ratio")
    assert vr[1] == pytest.approx(0.5) and vr[0] == pytest.approx(0.02)
    rnd = acquisition_scores(probs, "random", np.random.default_rng(0))
    assert rnd.shape == (3,)
    with pytest.raises(ValueError, match="unknown acquisition"):
        acquisition_scores(probs, "nope")
    assert set(ACQUISITION_FNS) >= {"entropy", "bald", "margin",
                                    "variation_ratio", "random"}


def _brightness_pool(seed=0):
    """Binary brightness task: pure-dark / pure-bright samples (easy) plus a
    block of mid-brightness BOUNDARY samples only an uncertainty-aware
    labeler should chase. Returns (pool, valid, boundary_indices)."""
    rng = np.random.default_rng(seed)

    def imgs(n, level):
        return np.clip(rng.normal(level, 12, (n, 8, 8, 3)), 0, 255).astype(np.uint8)

    pure = np.concatenate([imgs(28, 40), imgs(28, 210)])
    pure_t = np.concatenate([np.zeros(28), np.ones(28)]).astype(np.int64)
    boundary = imgs(8, 125)
    boundary_t = (rng.random(8) < 0.5).astype(np.int64)
    images = np.concatenate([pure, boundary])
    targets = np.concatenate([pure_t, boundary_t])
    boundary_idx = np.arange(len(pure), len(images))

    tf = parse_transforms_specification(["to_tensor"])
    pool = PreprocessedDataset(
        ArrayDataset(images, targets, classes=["dark", "bright"], name="al_pool"),
        transform=tf)
    valid = PreprocessedDataset(
        ArrayDataset(np.concatenate([imgs(8, 40), imgs(8, 210)]),
                     np.concatenate([np.zeros(8), np.ones(8)]).astype(np.int64),
                     classes=["dark", "bright"], name="al_valid"),
        transform=tf)
    return pool, valid, boundary_idx


def _run(acquisition, pool, valid, tmp_path, seed=3):
    hp = {"epochs": 12, "batch_size": 16, "optimizer_opts": {"lr": 1e-2},
          "save_every_iters": 0, "validate_every_epochs": 12,
          "log_progress_every_iters": 0, "output_path": str(tmp_path / acquisition)}
    return active_learning_loop(
        (8, 8, 3), load_yaml(MODEL), hp, cross_entropy_loss,
        {"poolset": pool, "validset": valid},
        rounds=2, acquire_per_round=8, init_labeled=np.arange(32),  # pure only
        acquisition=acquisition, n_mc=4, seed=seed)


def test_loop_uncertainty_beats_random_at_finding_the_boundary(tmp_path):
    pool, valid, boundary_idx = _brightness_pool()
    ent = _run("entropy", pool, valid, tmp_path)
    rnd = _run("random", pool, valid, tmp_path)

    # mechanics: monotone labeled growth, unique indices, recorded metrics
    for res in (ent, rnd):
        assert [r["n_labeled"] for r in res["rounds"]] == [32, 40]
        assert len(np.unique(res["labeled_indices"])) == 40
        assert all("valid_accuracy" in r for r in res["rounds"])
        assert len(res["rounds"][0]["acquired"]) == 8
        assert not res["rounds"][1]["acquired"]      # no acquire after last
        # round-0 training never saw the acquired samples
        assert not set(res["rounds"][0]["acquired"]) & set(range(32))

    hits = lambda res: len(set(res["rounds"][0]["acquired"]) & set(boundary_idx))
    # 8 boundary samples among 32 candidates: entropy should take nearly all
    # of them; a random labeler expects 8*(8/32) = 2
    assert hits(ent) >= 6, ent["rounds"][0]["acquired"]
    assert hits(ent) > hits(rnd)


def test_mc_probabilities_shape_and_dropout_variation(tmp_path):
    pool, valid, _ = _brightness_pool(seed=1)
    res = _run("entropy", pool, valid, tmp_path, seed=5)
    model, state = res["model"], res["state"]
    probs = mc_class_probabilities(model, state.variables(), pool,
                                   np.arange(10), n_samples=3,
                                   batch_size=4, seed=0)  # ragged tail: 4,4,2
    assert probs.shape == (3, 10, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # dropout_prob > 0: MC samples must actually differ
    assert np.abs(probs[0] - probs[1]).max() > 1e-6
