"""Inference/serving path: checkpoint -> jitted batched predictor.

The reference has no serving story (training-only project); this is the
production-deployment surface the TPU rebuild adds: restore a trained
checkpoint, build a fixed-batch jitted predict function (padding ragged
final batches to keep one compiled program), stream numpy inputs through it.

Usage::

    predictor = Predictor.from_checkpoint(model, "path/to/checkpoints",
                                          preprocess=trainset.batch_transform)
    probs = predictor(images_uint8)          # any leading batch size
    stats = predictor.benchmark(batch=1024)  # img/s on this host+device
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Predictor", "EnsemblePredictor", "StackedEnsemble",
           "distill_targets", "ensemble_distill_targets",
           "save_model_bundle", "load_model_bundle",
           "export_stablehlo", "load_stablehlo"]


def save_model_bundle(directory: Union[str, Path], model, variables,
                      extra_meta: Optional[Dict[str, Any]] = None) -> Path:
    """Persist a self-contained deployable artifact: the model's YAML spec
    (hp + input shape) alongside its variables.

    ``load_model_bundle(dir)`` reconstructs the model WITHOUT the training
    code path — the serving-side counterpart the reference never had.
    """
    import orbax.checkpoint as ocp
    import yaml

    def yamlable(obj):
        """YAML-safe hp tree: TaggedFactory/callables -> identifier strings
        (strings resolve back through the registry + reference aliases)."""
        if hasattr(obj, "identifier"):  # TaggedFactory
            return obj.identifier
        if isinstance(obj, dict):
            return {k: yamlable(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [yamlable(v) for v in obj]
        if callable(obj):
            from deepcv_tpu.utils import identifier_to_str
            from deepcv_tpu.ops.nn import ACTIVATION_FNS
            for name, fn in ACTIVATION_FNS.items():
                if obj is fn:
                    return name
            return identifier_to_str(obj)
        return obj

    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    meta = {"input_shape": list(model.input_shape),
            "hp": yamlable(model.hp.to_dict()),
            "nas_mode": getattr(model, "nas_mode", "fixed"),
            "nas_arch": yamlable(dict(getattr(model, "nas_arch", {}))),
            **(extra_meta or {})}
    (d / "model.yaml").write_text(yaml.safe_dump(meta, sort_keys=False,
                                                 default_flow_style=False))
    ckptr = ocp.StandardCheckpointer()
    # store host numpy: keeps the bundle loadable on ANY backend (a checkpoint
    # of device arrays pins restore to the saving device type)
    host_vars = jax.device_get(dict(variables))
    ckptr.save((d / "variables").absolute(), host_vars, force=True)
    ckptr.wait_until_finished()
    return d


def load_model_bundle(directory: Union[str, Path], dtype=None,
                      quantize: Optional[str] = None,
                      quantize_scales: Optional[Dict[str, float]] = None):
    """Reconstruct (model, variables) from a saved bundle.

    ``quantize='int8'`` rebuilds the model with every conv/dense computing in
    w8a8 on the MXU's int8 path (dynamic activation scales, per-channel
    weight scales) — the float variables restore unchanged because the
    quantization lives inside the op, not in the params.
    """
    import orbax.checkpoint as ocp
    import yaml

    from deepcv_tpu.spec import DeepcvModule

    import numpy as _np

    d = Path(directory)
    meta = yaml.safe_load((d / "model.yaml").read_text())
    model = DeepcvModule(tuple(meta["input_shape"]), meta["hp"],
                         nas_mode=meta.get("nas_mode", "fixed"),
                         nas_arch=meta.get("nas_arch") or {}, dtype=dtype,
                         quantize=quantize, quantize_scales=quantize_scales)
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore((d / "variables").absolute())
    # tolerate bundles written before the host-numpy convention: pull any
    # device-typed leaves to host so the current backend can consume them
    variables = jax.tree_util.tree_map(_np.asarray, variables)
    return model, variables

def export_stablehlo(path: Union[str, Path], model, variables,
                     batch_size: int = 256, dtype=jnp.float32,
                     platforms: Optional[Sequence[str]] = None) -> Path:
    """Serialize the jitted forward (params baked in) as a StableHLO artifact
    via ``jax.export`` — a deployable program that needs NO model-construction
    code (not even this framework) to run, only jax: the TPU-native analogue
    of the reference's absent torchscript/ONNX export story.

    The artifact is shape-specialized to ``(batch_size, *input_shape)``;
    serve ragged tails by padding (see Predictor.__call__).
    """
    from jax import export as jexport

    x_spec = jax.ShapeDtypeStruct((batch_size, *model.input_shape), dtype)
    host_vars = jax.device_get(dict(variables))

    def fwd(x):
        return model.apply(host_vars, x, train=False)

    kw = {"platforms": list(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(fwd), **kw)(x_spec)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(exported.serialize())
    return p


def load_stablehlo(path: Union[str, Path]) -> Callable:
    """Rehydrate an export_stablehlo artifact into a callable ``f(x)``."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)


_logger = logging.getLogger(__name__)


def _stack_distill_targets(dataset, logits_fn, suffix: str):
    """Shared producer of the (N, 1 + C) [hard label | logits] target
    layout ``train.losses.distillation_loss`` consumes. Validates labels
    BEFORE invoking ``logits_fn`` (the potentially long teacher inference)."""
    from deepcv_tpu.data.datasets import ArrayDataset

    labels = np.asarray(dataset.targets, np.float32).reshape(len(dataset), -1)
    if labels.shape[1] != 1:
        raise ValueError("distill targets expect integer class targets "
                         f"(got target shape {np.shape(dataset.targets)})")
    logits = np.asarray(logits_fn(), np.float32)
    # keep the class count discoverable: the stacked float targets no longer
    # let ArrayDataset infer it from integer labels
    classes = dataset.classes or [f"class_{i}"
                                  for i in range(logits.shape[1])]
    return ArrayDataset(dataset.images,
                        np.concatenate([labels, logits], axis=1),
                        classes=classes,
                        name=f"{dataset.name}_{suffix}",
                        provenance=getattr(dataset, "provenance", "real"))


def distill_targets(teacher_model, teacher_variables, dataset,
                    batch_size: int = 256, preprocess=None):
    """Precompute a frozen teacher's logits over ``dataset`` and return a
    new ArrayDataset whose targets stack [hard label | teacher logits]
    (N, 1 + C) — the layout ``train.losses.distillation_loss`` consumes.
    Offline distillation: the teacher runs ONCE here, so the student's
    train step stays single-model (no teacher weights in HBM, no extra
    forward per step)."""
    pred = Predictor(teacher_model, teacher_variables,
                     batch_size=batch_size, preprocess=preprocess)
    return _stack_distill_targets(dataset, lambda: pred(dataset.images),
                                  "distill")


class Predictor:
    """Batched jitted inference over a fixed compiled batch size.

    ``tta='flip'`` enables test-time augmentation: the model also runs on
    the horizontally mirrored batch and the two outputs are averaged —
    the classic +0.x% classification trick, ~2x compute, ONE jitted
    program (the flip fuses in). Output-equivariant tasks (detection
    grids, segmentation maps) need task-aware merging — TTA here is for
    spatially-invariant heads (classification logits/embeddings)."""

    def __init__(self, model, variables, batch_size: int = 256,
                 preprocess: Optional[Callable] = None,
                 postprocess: Optional[Callable] = None,
                 dtype: Any = None, bake_params: bool = False,
                 tta: Optional[str] = None):
        self.model = model
        self.variables = variables
        self.batch_size = int(batch_size)
        self.preprocess = preprocess
        self.postprocess = postprocess
        self.dtype = jnp.dtype(dtype) if isinstance(dtype, str) else dtype
        if tta not in (None, "flip"):
            raise ValueError(f"unknown tta mode {tta!r} (known: 'flip')")
        self.tta = tta

        def fwd(variables, x):
            if self.preprocess is not None:
                try:  # PreprocessedDataset.batch_transform(x, augment=False)
                    x = self.preprocess(x, augment=False)
                except TypeError:
                    x = self.preprocess(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
            y = model.apply(variables, x, train=False)
            if self.tta == "flip":
                y_f = model.apply(variables, x[:, :, ::-1, :], train=False)
                y = (y + y_f) * 0.5
            if self.postprocess is not None:
                y = self.postprocess(y)
            return y

        if bake_params:
            # freeze weights INTO the compiled program (export-style serving:
            # the predictor carries no mutable variables and __call__ ships
            # only the image batch to the device). Measured on v5e (wide
            # classifier, batch 4096): throughput-neutral for both bf16 and
            # int8 — weight-side work is negligible next to activations — so
            # this is a deployment-shape choice, not a perf lever.
            baked = jax.device_get(dict(variables))
            jit1 = jax.jit(lambda x: fwd(baked, x))
            self._jit_fwd = lambda _variables, x: jit1(x)
        else:
            self._jit_fwd = jax.jit(fwd)

    # ------------------------------------------------------------ factories
    @classmethod
    def from_checkpoint(cls, model, checkpoint_path: Union[str, Path],
                        best: bool = True, **kw) -> "Predictor":
        """Restore {params, batch_stats} from a train() CheckpointManager dir
        (best-k when available, else latest step) or a raw orbax path."""
        from deepcv_tpu.train.checkpoint import CheckpointManager, resume_from_path

        p = Path(checkpoint_path)
        state = None
        if (p / "best").exists() and best:
            try:
                mgr = CheckpointManager(p)
                state = mgr.restore_best()  # raw pytree dict
                mgr.close()
            except FileNotFoundError:
                state = None
        if state is None:
            state = resume_from_path(p)      # raw pytree dict
        variables = {"params": state["params"]}
        if state.get("batch_stats") is not None:
            variables["batch_stats"] = state["batch_stats"]
        return cls(model, variables, **kw)

    # ------------------------------------------------------------ inference
    def __call__(self, images: np.ndarray) -> np.ndarray:
        """Predict any leading batch size; ragged tails are zero-padded to the
        compiled batch (one XLA program, no recompiles)."""
        n = len(images)
        if n == 0:
            # derive the empty-output shape WITHOUT executing the model:
            # eval_shape traces only. An empty plain list carries no item
            # dims — fall back to the model's input shape.
            item_shape = tuple(np.asarray(images).shape[1:]) or \
                tuple(self.model.input_shape)
            probe = jax.eval_shape(
                self._jit_fwd, self.variables,
                jax.ShapeDtypeStruct((self.batch_size, *item_shape),
                                     jnp.float32))
            return np.empty((0, *probe.shape[1:]), probe.dtype)
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            chunk = images[start:start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            y = self._jit_fwd(self.variables, jnp.asarray(chunk))
            outs.append(np.asarray(y)[:bs - pad if pad else bs])
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    def predict_with_uncertainty(self, images: np.ndarray, n_samples: int = 8,
                                 seed: int = 0):
        """MC-dropout predictive uncertainty (the working take on the
        reference's empty ``meta/uncertainty_WIP`` package): run the model
        n times in train-mode dropout, return (mean, std) over samples.
        Models without dropout yield std == 0."""
        def fwd(variables, x, key):
            if self.preprocess is not None:
                try:
                    x = self.preprocess(x, augment=False)
                except TypeError:
                    x = self.preprocess(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
            # train=True enables dropout; batch-stat collections must be
            # mutable (flax BN updates them in train mode — immutable would
            # raise on every batch_norm model) and the updates are DISCARDED.
            # Note: BN therefore normalizes with MC-batch statistics during
            # sampling, the standard MC-dropout compromise.
            mut = [c for c in ("batch_stats",) if c in variables]

            def one(v):
                out = self.model.apply(variables, v, train=True,
                                       rngs={"dropout": key},
                                       mutable=mut if mut else False)
                return out[0] if isinstance(out, tuple) else out

            y = one(x)
            if self.tta == "flip":   # keep the MC mean consistent with
                y = (y + one(x[:, :, ::-1, :])) * 0.5  # __call__'s predictor
            return y

        # cache the compiled MC forward: rebuilding jax.jit per call would
        # re-trace and recompile every time
        jfwd = getattr(self, "_jit_mc_fwd", None)
        if jfwd is None:
            jfwd = self._jit_mc_fwd = jax.jit(fwd)
        x = jnp.asarray(images)
        outs = jnp.stack([jfwd(self.variables, x,
                               jax.random.PRNGKey(seed + i))
                          for i in range(n_samples)])
        return np.asarray(outs.mean(axis=0)), np.asarray(outs.std(axis=0))

    def benchmark(self, batch: Optional[int] = None, n_iters: int = 20,
                  image_shape: Optional[Sequence[int]] = None) -> Dict[str, float]:
        """Steady-state inference throughput with forced host syncs."""
        bs = int(batch or self.batch_size)
        shape = tuple(image_shape or self.model.input_shape)
        x = np.random.default_rng(0).integers(0, 256, (bs, *shape)).astype(np.uint8)
        xj = jnp.asarray(x)
        y = self._jit_fwd(self.variables, xj)
        float(jnp.sum(y))  # force real completion (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            y = self._jit_fwd(self.variables, xj)
        s = float(jnp.sum(y))  # forced sync
        dt = time.perf_counter() - t0
        return {"img_per_s": bs * n_iters / dt, "latency_ms": dt / n_iters * 1e3,
                "batch": bs, "checksum": s}


# --------------------------------------------------------------------------- #
# Ensembling & stacking (reference README TODO "Start Ensembling and stacking
# utilities module implementation", /root/reference/README.md:149 — never
# started there)
# --------------------------------------------------------------------------- #

class EnsemblePredictor:
    """Average N member models' predictions.

    ``members``: :class:`Predictor` instances or ``(model, variables)``
    pairs (mixed architectures welcome — that is the point of ensembling).
    ``mode='prob'`` (default) averages softmax probabilities — the standard
    classifier ensemble; ``mode='mean'`` averages raw outputs (embeddings,
    regression heads). Optional per-member ``weights`` (normalized).
    """

    def __init__(self, members, mode: str = "prob", weights=None, **predictor_kw):
        if mode not in ("prob", "mean"):
            raise ValueError(f"unknown ensemble mode {mode!r} (prob|mean)")
        self.members = [m if isinstance(m, Predictor)
                        else Predictor(m[0], m[1], **predictor_kw)
                        for m in members]
        if not self.members:
            raise ValueError("EnsemblePredictor needs at least one member")
        self.mode = mode
        w = np.ones(len(self.members)) if weights is None else np.asarray(
            weights, np.float64)
        if w.shape != (len(self.members),) or (w < 0).any() or w.sum() <= 0:
            raise ValueError("weights must be non-negative, one per member")
        self.weights = w / w.sum()

    def member_outputs(self, images) -> np.ndarray:
        """(M, N, C) raw member outputs (the stacker's feature layout)."""
        return np.stack([np.asarray(p(images), np.float32)
                         for p in self.members])

    def __call__(self, images) -> np.ndarray:
        outs = self.member_outputs(images)
        if self.mode == "prob":
            outs = np.asarray(jax.nn.softmax(jnp.asarray(outs), axis=-1))
        return np.einsum("m,mnc->nc", self.weights, outs)


class StackedEnsemble(EnsemblePredictor):
    """Stacking: a learned linear combiner over the members' probabilities
    instead of a fixed average. ``fit`` trains one Dense (M*C -> C) head
    with softmax cross-entropy on a HELD-OUT split (fitting the stacker on
    the members' own training data overfits to their confidence) — one
    jitted full-batch Adam loop, the members run once."""

    def fit(self, images, labels, *, steps: int = 300, lr: float = 0.05,
            l2: float = 1e-4, seed: int = 0) -> float:
        import optax

        probs = jax.nn.softmax(jnp.asarray(self.member_outputs(images)),
                               axis=-1)
        m, n, c = probs.shape
        feats = jnp.transpose(probs, (1, 0, 2)).reshape(n, m * c)
        y = jnp.asarray(np.asarray(labels).reshape(-1), jnp.int32)
        if y.shape[0] != n:
            raise ValueError(f"{n} stacked rows vs {y.shape[0]} labels")
        # init at the uniform-average ensemble: W stacks identity blocks
        w0 = jnp.tile(jnp.eye(c), (m, 1)) / m
        params = {"w": w0, "b": jnp.zeros((c,))}
        tx = optax.adam(lr)
        opt = tx.init(params)

        def loss_fn(p):
            logits = feats @ p["w"] + p["b"]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.mean(ce) + l2 * jnp.sum(p["w"] ** 2)

        @jax.jit
        def run(params, opt):
            def step(carry, _):
                p, o = carry
                loss, g = jax.value_and_grad(loss_fn)(p)
                u, o = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o), loss
            (p, o), losses = jax.lax.scan(step, (params, opt), None,
                                          length=steps)
            return p, losses[-1]

        self._stack_params, final_loss = run(params, opt)
        return float(final_loss)

    def __call__(self, images) -> np.ndarray:
        if not hasattr(self, "_stack_params"):
            raise RuntimeError("StackedEnsemble: call fit(images, labels) on "
                               "a held-out split before predicting")
        probs = jax.nn.softmax(jnp.asarray(self.member_outputs(images)),
                               axis=-1)
        m, n, c = probs.shape
        feats = jnp.transpose(probs, (1, 0, 2)).reshape(n, m * c)
        p = self._stack_params
        return np.asarray(feats @ p["w"] + p["b"])


def ensemble_distill_targets(members, dataset, batch_size: int = 256,
                             preprocess=None):
    """Distill from an ENSEMBLE of teachers (reference README TODO
    "distillation from ensembles of teacher networks",
    /root/reference/README.md:152): soft targets are the members'
    mean softmax probability re-expressed as log-probs (softmax-invariant
    pseudo-logits), stacked [hard label | pseudo-logits] exactly like
    :func:`distill_targets` so ``train.losses.distillation_loss`` consumes
    it unchanged."""
    ens = EnsemblePredictor(members, mode="prob", batch_size=batch_size,
                            preprocess=preprocess)

    def pseudo_logits():
        mean_prob = np.asarray(ens(dataset.images), np.float32)
        return np.log(np.maximum(mean_prob, 1e-12))

    return _stack_distill_targets(dataset, pseudo_logits, "ens_distill")
