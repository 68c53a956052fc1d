"""Seeded fuzz of crash/resume EXACTNESS across training-feature combos.

Invariant: for any combination of data path (resident/streaming), sampling
mode, gradient accumulation, EMA, and crash step, training that crashes and
resumes from the checkpoint must land on final params (and EMA shadow)
IDENTICAL to the uninterrupted run — exact in-epoch resume is a contract of
the runtime (reference resume semantics, ignite_training.py:393-399, made
bit-exact here), not a property of one blessed configuration.
"""
import glob

import jax
import numpy as np
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.data.datasets import load_dataset
from deepcv_tpu.data.preprocess import preprocess
from deepcv_tpu.train import train, BackendConfig, cross_entropy_loss
from deepcv_tpu.train.training import CrashIteration

MODEL_YML = """
act_fn: relu
batch_norm: { momentum: 0.1 }
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 6, padding: 1 }
  - flatten: {}
  - fully_connected: { act_fn: null, out_features: 4, batch_norm: null }
"""


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    raw = load_dataset("synthetic", n=192, image_shape=(8, 8, 3),
                       num_classes=4, seed=0)
    data = preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]},
                      cache_dir=tmp_path_factory.mktemp("stats"))
    model = DeepcvModule((8, 8, 3), load_yaml(MODEL_YML))
    return model, data


def _final_trees(state):
    trees = {"params": state.params, "opt": state.opt_state}
    if state.batch_stats is not None:
        trees["bs"] = state.batch_stats
    if state.ema_params is not None:
        trees["ema"] = state.ema_params
    return jax.device_get(trees)


N_COMBOS = 4


@pytest.mark.parametrize("combo", range(N_COMBOS))
def test_crash_resume_exactness_fuzz(setup, tmp_path, combo):
    rng = np.random.default_rng(1234 + combo)
    model, data = setup
    resident = bool(rng.integers(0, 2))
    hp = {
        "epochs": 2,
        "batch_size": int(rng.choice([24, 48])),
        "optimizer": str(rng.choice(["adamw", "sgd"])),
        "optimizer_opts": {"lr": 3e-3, "momentum": 0.9}
        if rng.integers(0, 2) else {"lr": 3e-3},
        "device_resident_dataset": resident,
        "sampling": str(rng.choice(["epoch", "with_replacement"]))
        if resident else "epoch",
        "grad_accumulation_steps": int(rng.choice([1, 2])),
        "ema_decay": float(rng.choice([0.0, 0.9])) if rng.integers(0, 2)
        else None,
        "stream_scan_batches": int(rng.choice([1, 3])),
        "log_progress_every_iters": int(rng.choice([1, 4])),
        "save_every_iters": 2,
        "seed": int(rng.integers(0, 10_000)),
        "output_path": str(tmp_path / "base"),
    }
    be1 = BackendConfig(n_devices=1)
    spe = (len(data["trainset"]) // hp["batch_size"])
    crash_at = int(rng.integers(2, 2 * spe))   # must be past one save point
    crash_at = (crash_at // 2) * 2 + 1          # strictly after a save

    # ground truth: the uninterrupted run
    gt_state, gt_hist = train(dict(hp), model, cross_entropy_loss, data,
                              backend_conf=be1)

    # crashed run + resume from its checkpoint dir
    hp_crash = dict(hp, crash_iteration=crash_at,
                    output_path=str(tmp_path / "crash"))
    with pytest.raises(CrashIteration):
        train(hp_crash, model, cross_entropy_loss, data, backend_conf=be1)
    ckpt = sorted(glob.glob(str(tmp_path / "crash" / "run_*" /
                                "checkpoints")))[-1]
    res_state, res_hist = train(
        dict(hp_crash, crash_iteration=-1, resume_from=ckpt),
        model, cross_entropy_loss, data, backend_conf=be1)

    assert res_hist["steps"] == gt_hist["steps"], (combo, hp)
    gt, res = _final_trees(gt_state), _final_trees(res_state)
    assert set(gt) == set(res)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"combo {combo}: resume diverged ({hp})"),
        gt, res)
