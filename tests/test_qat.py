"""Quantization-aware training (r2 verdict Missing #4).

The reference wires NNI quantizers into its train loop (update_epoch/step,
ignite_training.py:335-344). Here QAT is a DeepcvModule build mode:
``quantize='int<N>_qat'`` injects fake-quant (quantize->dequantize with a
straight-through estimator) at every conv/dense input — training runs in
float with quantization noise, ranges recomputed per STEP inside the jitted
program (fresher than the reference's per-epoch refresh). Serving rebuilds
with the REAL int8 kernels (identical param tree).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.train import train
from deepcv_tpu.train.backend import BackendConfig


def _data():
    """Class-structured (LEARNABLE) synthetic data: per-class prototype +
    noise. load_dataset('synthetic') pairs random pixels with random labels —
    fine for throughput, but quantized-accuracy comparisons need a task
    where validation accuracy measures generalization, not memorization."""
    from deepcv_tpu.data.datasets import ArrayDataset
    from deepcv_tpu.data.preprocess import preprocess
    rng = np.random.default_rng(3)
    protos = rng.normal(size=(4, 8, 8, 3))
    y = rng.integers(0, 4, 512)
    x = np.clip(protos[y] * 12 + 128 + rng.normal(scale=50, size=(512, 8, 8, 3)),
                0, 255).astype(np.uint8)
    raw = ArrayDataset(x, y.astype(np.int32), classes=list("abcd"),
                       name="protos", provenance="synthetic")
    return preprocess({"trainset": raw},
                      {"seed": 1, "split_dataset": {"validset_ratio": 0.25},
                       "transforms": ["to_tensor"]})


_ARCH = ("act_fn: relu\narchitecture:\n"
         "  - conv2d: {kernel_size: [3,3], out_channels: 8, padding: 1}\n"
         "  - conv2d: {kernel_size: [3,3], out_channels: 8, padding: 1}\n"
         "  - flatten: {}\n"
         "  - fully_connected: {act_fn: null, out_features: 4}")


def _train(model, data, tmp_path, seed=11):
    hp = {"epochs": 8, "batch_size": 32, "optimizer_opts": {"lr": 1e-2},
          "save_every_iters": 0, "log_progress_every_iters": 12,
          "validate_every_epochs": 100, "output_path": str(tmp_path),
          "seed": seed}
    return train(hp, model, "cross_entropy", data,
                 backend_conf=BackendConfig(n_devices=1))


def _accuracy(model, variables, data):
    inner = data["validset"].dataset
    x = data["validset"].batch_transform(jnp.asarray(inner.images), augment=False)
    y = jnp.asarray(inner.targets)
    logits = model.apply(variables, x, train=False)
    return float((jnp.argmax(logits, -1) == y).mean())


def test_qat_trains_and_gradients_flow(tmp_path):
    """The straight-through estimator keeps the fake-quant build trainable:
    loss decreases, and the QAT param tree is IDENTICAL to the float one."""
    data = _data()
    hp = load_yaml(_ARCH)
    mq = DeepcvModule((8, 8, 3), hp, quantize="int8_qat")
    mf = DeepcvModule((8, 8, 3), hp)
    assert (jax.tree_util.tree_structure(mq.init(jax.random.PRNGKey(0)))
            == jax.tree_util.tree_structure(mf.init(jax.random.PRNGKey(0))))
    state, hist = _train(mq, data, tmp_path)
    losses = [r["main_loss"] for r in hist["train"]]
    assert losses[-1] < losses[0] * 0.9


def test_real_int8_build_refuses_training():
    m = DeepcvModule((8, 8, 3), load_yaml(_ARCH), quantize="int8")
    v = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="inference-only"):
        m.apply(v, jnp.zeros((2, 8, 8, 3)), train=True,
                rngs={"dropout": jax.random.PRNGKey(1)})


def test_qat_beats_ptq_at_low_bits(tmp_path):
    """The headline QAT claim on a seeded run: FINE-TUNING under the
    quantization grid (the standard QAT pipeline — float pretrain, then
    fake-quant fine-tune at low lr via train(init_variables=...)) keeps more
    accuracy at the quantized deployment point than post-training
    quantization of the float weights. Measured at int3 — at int8 both
    pipelines sit at ~full-precision accuracy on a model this small, so a
    low-bit grid is where the adaptation is visible."""
    data = _data()
    hp = load_yaml(_ARCH)

    # PTQ pipeline: train FLOAT, deploy on the int3 grid
    mf = DeepcvModule((8, 8, 3), hp)
    state_f, _ = _train(mf, data, tmp_path / "float")
    vf = {"params": jax.device_get(state_f.params)}
    acc_float = _accuracy(mf, vf, data)
    m_dep = mf.with_options(quantize="int3_qat")   # eval = deterministic fake quant
    acc_ptq = _accuracy(m_dep, vf, data)

    # QAT pipeline: fine-tune the SAME float weights under the int3 grid
    mq = DeepcvModule((8, 8, 3), hp, quantize="int3_qat")
    hp_ft = {"epochs": 4, "batch_size": 32, "optimizer_opts": {"lr": 2e-3},
             "save_every_iters": 0, "log_progress_every_iters": 12,
             "validate_every_epochs": 100, "output_path": str(tmp_path / "qat"),
             "seed": 11}
    state_q, _ = train(hp_ft, mq, "cross_entropy", data,
                       backend_conf=BackendConfig(n_devices=1),
                       init_variables=vf)
    vq = {"params": jax.device_get(state_q.params)}
    acc_qat = _accuracy(m_dep, vq, data)

    assert acc_float > 0.5                      # the task is learnable
    assert acc_ptq < acc_float - 0.02           # the grid actually hurts PTQ
    assert acc_qat > acc_ptq + 0.02, (acc_float, acc_ptq, acc_qat)


def test_qat_then_int8_serving_pipeline(tmp_path):
    """End-to-end deployment flow: QAT train -> calibrate on the QAT model ->
    rebuild with the REAL int8 MXU kernels (same param tree) -> top-1
    agreement with the float forward at least as good as the float-trained
    PTQ pipeline's."""
    from deepcv_tpu.compression import calibrate_int8_scales

    data = _data()
    hp = load_yaml(_ARCH)
    inner = data["validset"].dataset
    x = data["validset"].batch_transform(jnp.asarray(inner.images), augment=False)

    def int8_agreement(train_quantize):
        m = DeepcvModule((8, 8, 3), hp, quantize=train_quantize)
        state, _ = _train(m, data, tmp_path / (train_quantize or "float"))
        v = {"params": jax.device_get(state.params)}
        mf = m.with_options(quantize=None)
        scales = calibrate_int8_scales(mf, v, [x[:64]])
        ms = m.with_options(quantize="int8", quantize_scales=scales)
        yf = mf.apply(v, x, train=False)
        ys = ms.apply(v, x, train=False)
        return float((jnp.argmax(yf, -1) == jnp.argmax(ys, -1)).mean())

    agree_ptq = int8_agreement(None)
    agree_qat = int8_agreement("int8_qat")
    assert agree_qat >= agree_ptq - 1e-6, (agree_ptq, agree_qat)
    assert agree_qat > 0.9
