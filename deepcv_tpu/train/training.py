"""The training procedure: one jitted train step over a device mesh.

Reference parity: ``deepcv.meta.ignite_training.train``
(/root/reference/src/deepcv/meta/ignite_training.py:178-370) — defaults dict,
multi-loss weighted mean, scheduler from YAML spec (incl. safe eval-string
milestones), periodic + best-k checkpointing, resume, validation cadence,
crash_iteration fault injection, per-rank seeds, rank-0-only side effects.

TPU-first redesign:
  * ONE ``jax.jit`` train step (forward + loss + backward + optimizer +
    on-device augmentation/normalization) under GSPMD sharding: the batch is
    sharded over the mesh 'data' axis, params are replicated — XLA inserts the
    gradient allreduce (DDP parity) and computes GLOBAL batch-norm statistics
    (SyncBatchNorm parity) automatically, because sharded-array semantics are
    global. No process groups, no DDP wrapper, no sampler classes.
  * input path: raw uint8 batches stream via double-buffered ``device_put``
    (or live fully device-resident), and ALL preprocessing/augmentation fuses
    into the step's XLA program.
  * state is donated every step — zero-copy parameter updates.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import signal
import threading
import time
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.struct
from jax.sharding import NamedSharding, PartitionSpec

from deepcv_tpu.hyperparams import to_hyperparameters, Hyperparameters
from deepcv_tpu.data.datasets import ArrayDataset
from deepcv_tpu.data.preprocess import PreprocessedDataset
from deepcv_tpu.data.pipeline import BatchIterator, prefetch_to_device, DeviceDataset
from deepcv_tpu.train.backend import BackendConfig
from deepcv_tpu.train.losses import WeightedLosses
from deepcv_tpu.train.metrics import METRIC_FNS, MetricAccumulator, accuracy
from deepcv_tpu.train.schedules import build_schedule, build_schedules  # noqa: F401 (build_schedule re-exported)
from deepcv_tpu.train.checkpoint import CheckpointManager, resume_from_path
from deepcv_tpu.utils import EventsHandler

__all__ = ["TrainState", "train", "train_with_retries", "TRAINING_HP_DEFAULTS",
           "build_optimizer", "scale_updates_by_path", "CrashIteration",
           "TrainingEvents", "Preempted", "request_preemption"]

_logger = logging.getLogger(__name__)


#: reference TRAINING_HP_DEFAULTS parity (ignite_training.py:201-203)
TRAINING_HP_DEFAULTS: Dict[str, Any] = {
    "epochs": ...,
    "batch_size": ...,
    "optimizer_opts": ...,
    "optimizer": "adamw",
    "scheduler": None,
    "losses_weights": None,
    "validate_every_epochs": 1,
    "save_every_iters": 1000,
    "log_progress_every_iters": 100,
    "keep_best_models": 3,
    "prefetch_batches": True,
    "device_resident_dataset": "auto",
    "resume_from": "",
    "crash_iteration": -1,
    # graceful preemption (TPU spot/preemptible VMs send SIGTERM before
    # eviction): install a SIGTERM handler for the duration of train();
    # at the next step boundary the loop checkpoints the full TrainState
    # and raises Preempted, so `resume_from` (or train_with_retries'
    # run-scoped resume dir) restarts exactly where the eviction hit.
    # Multi-host: every worker must receive the signal (GCE/GKE preemption
    # delivers it to all VMs) — orbax coordinates the joint save.
    "handle_preemption": True,
    "seed": 563454,
    "deterministic": False,          # reference deterministic_cudnn — XLA is deterministic
    "use_sync_batch_norm": True,     # GSPMD batch stats are global by construction
    "dtype": None,                   # compute dtype override ('bfloat16' on TPU)
    "output_path": "data/04_training",
    "eval_batch_multiplier": 32,     # reference: eval batch = 32 x train batch (:215)
    "nni_compression": None,         # reserved (reference :335-344)
    "log_grad_norm": True,           # global grad-norm as a per-step metric
    "log_param_histograms": False,   # param histograms at validation points
    "grad_accumulation_steps": 1,    # optax.MultiSteps: params update every k
    "remat": False,                  # jax.checkpoint the forward: trade FLOPs
                                     # for activation memory (big models/images)
    # 'epoch' (default) visits each sample exactly once per epoch (reference
    # DataLoader semantics, ignite_training.py:260-262); 'with_replacement'
    # is the opt-in uniform-sampling throughput mode
    "sampling": "epoch",
    "max_epochs_per_dispatch": 1,    # fuse k quiet epochs into one dispatch
    # host-sync (and throughput-measurement) cadence in dispatch groups: the
    # loop pulls state.step (a full host<->device round trip — ~25 ms on a
    # tunneled TPU) only every k-th group, letting the intervening dispatches
    # queue asynchronously. 1 = sync every group (exact current behavior);
    # the first two groups always sync so compile / first-run effects stay
    # isolated in their own throughput entries.
    "sync_every_dispatches": 1,
    # constant LR as an opt_state leaf (inject_hyperparams) instead of a
    # compiled-in constant: LR-sweep trials share one XLA executable via the
    # persistent compile cache. Off by default (it changes the opt_state
    # tree shape, which existing checkpoints embed).
    "runtime_lr": False,
    # single fused optimizer update over the raveled param vector
    # (optax.flatten) instead of per-tensor kernels — see the build site
    "flatten_optimizer": False,
    # params + batch stats stored as ONE raveled buffer each: optimizer /
    # EMA / stat-EMA updates run as single fused kernels instead of one
    # launch-bound kernel per tensor — see the build site (r4 verdict #3).
    # Incompatible with TP/ZeRO and path-based masks; changes checkpoints.
    "flat_params": False,
    # streaming path only: compress uint8 batches on the host->device wire
    # and decode on device (data/wirecodec.py). True = {'bits': 3,
    # 'axis': -2}, or a dict with those keys. Lossless with per-batch raw
    # fallback; pays off when the host->device link is the bottleneck.
    "wire_compression": False,
    "train_arch_params": True,       # False: zero updates to arch__ logits
                                     # (ENAS: an RL controller owns them)
    "run_dir": None,                 # explicit run directory name (else timestamped)
    # 'input' => self-supervised/autoencoder: loss target is the transformed
    # input batch (reference keypoints autoencoder, keypoints/detector.py:44-84)
    "self_supervised_target": None,
    # exponential moving average of params (production serving staple the
    # torch reference lacks): ema_t = d*ema_{t-1} + (1-d)*params_t, kept in
    # TrainState (checkpointed, donated, resumable). None disables.
    "ema_decay": None,
    "ema_eval": True,                # validate/serve with the EMA weights
    "gradient_clip_norm": None,      # clip grads to this global L2 norm
                                     # before the optimizer update
    # transfer learning: regex over '/'-joined param paths — matching
    # params get ZERO updates (e.g. 'submodule_0' to freeze a backbone,
    # '^(?!.*fully_connected)' to train only the head). Generalizes the
    # shared-image-block freeze (spec/module.py frozen_mask).
    "freeze_params": None,
    # per-layer/per-block LR scales (reference README.md:127): ordered
    # mapping {path-regex: scale} over the same '/'-joined param paths as
    # freeze_params; first match wins, unmatched params keep 1.0. Classic
    # fine-tuning recipe: {'fully_connected': 1.0, '.*': 0.1}.
    "lr_scales": None,
    # batch-mixing regularizers (beyond the reference; AugMix companions):
    # mixup (arXiv:1710.09412) / CutMix (arXiv:1905.04899) with the convex
    # loss combination lam*loss(y) + (1-lam)*loss(y[perm]). Both set =>
    # a fair per-step coin picks one (timm convention).
    "mixup_alpha": 0.0,
    "cutmix_alpha": 0.0,
    # MoE models (ops/moe.py): weight on the Switch load-balance aux loss
    # the MoE blocks sow (arXiv:2101.03961 uses 1e-2); ignored when the
    # model has no MoE blocks
    "moe_aux_weight": 0.01,
    # UDA semi-supervised training (arXiv:1904.12848; reference README TODO
    # :130): {weight, temperature, confidence_threshold, severity, width,
    # depth, ops}. Needs datasets['unlabeledset'] + the resident data path
    # + integer class targets (CE masks the -1 unlabeled rows).
    "uda": None,
}


class CrashIteration(RuntimeError):
    """Raised by the crash_iteration fault-injection hook
    (reference ignite_training.py:330-333 — for checkpoint/resume testing)."""


class Preempted(RuntimeError):
    """Raised by train() after a SIGTERM (or request_preemption()) once the
    loop has checkpointed at a step boundary. NOT retried by
    train_with_retries — the host is going away; a fresh invocation resumes
    from the saved step."""


# Set by the SIGTERM handler train() installs (hp['handle_preemption']) and by
# request_preemption(); consumed (cleared) by the running loop at the next
# host-visible step boundary.
_PREEMPTION = threading.Event()

# distinct from None: "train() never installed a handler" vs "the previous
# SIGTERM handler was installed outside Python" (signal.signal returns None)
_HANDLER_NOT_INSTALLED = object()


def request_preemption() -> None:
    """Programmatic SIGTERM equivalent: ask the running train() loop to
    checkpoint at the next step boundary and raise Preempted. Safe to call
    from any thread (e.g. an orchestrator's eviction-notice poller)."""
    _PREEMPTION.set()


class TrainingEvents(EventsHandler):
    ITERATION_COMPLETED = "iteration_completed"
    EPOCH_COMPLETED = "epoch_completed"
    VALIDATION_COMPLETED = "validation_completed"
    COMPLETED = "completed"

    def __init__(self):
        super().__init__(self.ITERATION_COMPLETED, self.EPOCH_COMPLETED,
                         self.VALIDATION_COMPLETED, self.COMPLETED)


class TrainState(flax.struct.PyTreeNode):
    """Everything that evolves during training, as one donatable pytree."""
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    # EMA shadow of ``params`` when hp['ema_decay'] is set, else None.
    # Batch stats are shared with the live model (the running averages are
    # already a slow EMA of batch statistics by construction).
    ema_params: Any = None

    def variables(self, ema: bool = False) -> Dict[str, Any]:
        use_ema = ema and self.ema_params is not None
        v = {"params": self.ema_params if use_ema else self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


# --------------------------------------------------------------------------- #
# Optimizers (torch optimizer_opts -> optax)
# --------------------------------------------------------------------------- #

def _scheduled_optimizer(name: str, opts: Dict[str, Any], lr,
                         extras: Mapping[str, Any]) -> optax.GradientTransformation:
    """Optimizer with non-LR hyperparameters on their own schedules
    (reference README.md:122 "multiple schedulers" / :127 momentum + L2
    policies): ``optax.inject_hyperparams`` re-invokes the factory each step
    with the instantaneous values, so ``momentum`` (SGD momentum / adam-family
    beta1, torch OneCycleLR's cycled hyperparameter) and ``weight_decay``
    may each be an ``optax.Schedule``."""
    mom = extras.get("momentum")
    wd = extras.get("weight_decay")
    if name == "adamw":
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=mom if mom is not None else float(b1),
            b2=float(b2), eps=float(opts.pop("eps", 1e-8)),
            weight_decay=wd if wd is not None else float(opts.pop("weight_decay", 1e-2)))
    if name == "adam":
        if wd is not None:
            raise ValueError("adam has no decoupled weight_decay to schedule "
                             "— use optimizer: adamw")
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=mom if mom is not None else float(b1),
            b2=float(b2), eps=float(opts.pop("eps", 1e-8)))
    if name == "sgd":
        def sgd_l2(learning_rate, momentum, weight_decay, nesterov):
            # torch SGD semantics: L2 term joins the gradient BEFORE the
            # momentum buffer (same composition as the unscheduled path).
            # momentum arrives as a TRACED scalar here — always keep the
            # momentum buffer (decay=0.0 is plain SGD), no python branch
            tx = optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov)
            return optax.chain(optax.add_decayed_weights(weight_decay), tx)

        return optax.inject_hyperparams(sgd_l2, static_args=("nesterov",))(
            learning_rate=lr,
            momentum=mom if mom is not None else float(opts.pop("momentum", 0.0)),
            weight_decay=wd if wd is not None else float(opts.pop("weight_decay", 0.0)),
            nesterov=bool(opts.pop("nesterov", False)))
    if name in ("lamb", "lion"):
        factory = optax.lamb if name == "lamb" else optax.lion
        b1, b2 = opts.pop("betas", (0.9, 0.999) if name == "lamb" else (0.9, 0.99))
        return optax.inject_hyperparams(factory)(
            learning_rate=lr, b1=mom if mom is not None else float(b1),
            b2=float(b2),
            weight_decay=wd if wd is not None else float(opts.pop("weight_decay", 0.0)))
    raise ValueError(
        f"momentum/weight_decay schedules are supported for adamw, adam, sgd, "
        f"lamb, lion — not '{name}' (drop the extra schedule or switch "
        f"optimizer)")


def scale_updates_by_path(lr_scales: Mapping[str, float]) -> optax.GradientTransformation:
    """Per-layer/per-block learning-rate scales (reference README.md:127
    "optional learning rate scales varying for each layers or conv blocks"):
    the final optimizer update of every param whose '/'-joined tree path
    matches a regex key is multiplied by that key's value. First matching
    pattern (insertion order) wins; unmatched params keep scale 1.0. Path
    strings and ``re.search`` semantics are the same as ``freeze_params``
    (scale 0.0 is exactly a freeze)."""
    import re as _re
    pats = [(_re.compile(str(p)), float(s)) for p, s in lr_scales.items()]

    def _scale_for(path) -> float:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, s in pats:
            if pat.search(key):
                return s
        return 1.0

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        # scales are python floats resolved at trace time — the multiply
        # const-folds into the update kernel, no runtime branching
        upd = jax.tree_util.tree_map_with_path(
            lambda path, u: u * _scale_for(path), updates)
        return upd, state

    return optax.GradientTransformation(init, update)


def _build_runtime_lr(name: str, opts: Mapping[str, Any], lr: float):
    """inject_hyperparams builders for the optimizers hp searches sweep:
    the learning rate becomes an ``opt_state`` leaf (a runtime input of the
    jitted step), so different LR values trace to the SAME HLO and the XLA
    executable is shared across trials. Returns None for optimizers without
    an injectable builder (build_optimizer falls back to the constant path).
    """
    opts = dict(opts)
    if name == "adamw":
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        opts.pop("amsgrad", None)
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=float(b1), b2=float(b2),
            eps=float(opts.pop("eps", 1e-8)),
            weight_decay=float(opts.pop("weight_decay", 1e-2)))
    if name == "adam":
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=float(b1), b2=float(b2),
            eps=float(opts.pop("eps", 1e-8)))
    if name == "sgd":
        mom = float(opts.pop("momentum", 0.0))
        wd = float(opts.pop("weight_decay", 0.0))
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=mom or None,
            nesterov=bool(opts.pop("nesterov", False)))
        if wd:
            # decayed weights are added BEFORE the lr-scaled step, exactly
            # as the constant-lr branch chains them
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if name == "lion":
        b1, b2 = opts.pop("betas", (0.9, 0.99))
        return optax.inject_hyperparams(optax.lion)(
            learning_rate=lr, b1=float(b1), b2=float(b2),
            weight_decay=float(opts.pop("weight_decay", 0.0)))
    return None


def build_optimizer(name: Union[str, Callable], optimizer_opts: Mapping[str, Any],
                    schedule=None, extra_schedules: Optional[Mapping[str, Any]] = None,
                    runtime_lr: bool = False
                    ) -> optax.GradientTransformation:
    """Map reference optimizer specs (torch.optim names + kwargs, e.g.
    parameters.yml:129-134 AdamW opts) onto optax transforms.

    ``extra_schedules`` (from ``build_schedules``: ``{'momentum': ...,
    'weight_decay': ...}``) routes through :func:`_scheduled_optimizer`.

    ``runtime_lr=True`` builds the common optimizers through
    ``optax.inject_hyperparams`` so the (constant) learning rate lives in
    ``opt_state`` instead of being burned into the compiled program — trials
    of an LR sweep then share ONE XLA executable (via the persistent compile
    cache) instead of recompiling per value. Only meaningful without an LR
    schedule; unknown optimizers silently fall through to the constant path.
    """
    if callable(name) and not isinstance(name, str):
        if extra_schedules:
            raise ValueError("momentum/weight_decay schedules cannot combine "
                             "with a custom optimizer factory")
        return name(optimizer_opts, schedule)
    opts = dict(optimizer_opts)
    lr = schedule if schedule is not None else float(opts.pop("lr", 1e-3))
    if schedule is not None:
        opts.pop("lr", None)
    name = str(getattr(name, "identifier", name)).rsplit(".", 1)[-1].lower()
    if extra_schedules:
        return _scheduled_optimizer(name, opts, lr, extra_schedules)
    if runtime_lr and schedule is None:
        built = _build_runtime_lr(name, opts, float(lr))
        if built is not None:
            return built
    if name in ("adamw",):
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        if opts.pop("amsgrad", False):
            _logger.warning("amsgrad not supported by optax.adamw; ignored")
        return optax.adamw(lr, b1=float(b1), b2=float(b2),
                           eps=float(opts.pop("eps", 1e-8)),
                           weight_decay=float(opts.pop("weight_decay", 1e-2)))
    if name in ("adam",):
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return optax.adam(lr, b1=float(b1), b2=float(b2),
                          eps=float(opts.pop("eps", 1e-8)))
    if name in ("sgd",):
        mom = float(opts.pop("momentum", 0.0))
        wd = float(opts.pop("weight_decay", 0.0))
        tx = optax.sgd(lr, momentum=mom or None,
                       nesterov=bool(opts.pop("nesterov", False)))
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if name in ("rmsprop",):
        return optax.rmsprop(lr, decay=float(opts.pop("alpha", 0.99)),
                             eps=float(opts.pop("eps", 1e-8)),
                             momentum=float(opts.pop("momentum", 0.0)))
    # large-batch optimizers (You et al., LARS arXiv:1708.03888 / LAMB
    # arXiv:1904.00962): layerwise trust ratios keep the huge global
    # batches TPU pods want trainable — the small-batch recipes above
    # diverge there. optax implementations, torch-style kwargs accepted.
    if name in ("lamb",):
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return optax.lamb(lr, b1=float(b1), b2=float(b2),
                          eps=float(opts.pop("eps", 1e-6)),
                          weight_decay=float(opts.pop("weight_decay", 0.0)))
    if name in ("lars",):
        return optax.lars(lr,
                          weight_decay=float(opts.pop("weight_decay", 0.0)),
                          momentum=float(opts.pop("momentum", 0.9)),
                          trust_coefficient=float(
                              opts.pop("trust_coefficient", 0.001)),
                          nesterov=bool(opts.pop("nesterov", False)))
    # TPU-era staples beyond the torch reference's AdamW default:
    if name in ("adafactor",):
        # Shazeer & Stern arXiv:1804.04235 — the T5/ViT-at-scale optimizer:
        # factored second moments give SUB-LINEAR optimizer memory (rows +
        # cols instead of a full f32 moment per param), the lever that lets
        # the biggest models fit HBM. optax's defaults already implement
        # the paper's update-clipping/decay schedule.
        return optax.adafactor(
            lr, min_dim_size_to_factor=int(opts.pop(
                "min_dim_size_to_factor", 128)),
            decay_rate=float(opts.pop("decay_rate", 0.8)),
            weight_decay_rate=float(opts.pop("weight_decay", 0.0)) or None,
            momentum=opts.pop("momentum", None))
    if name in ("lion",):
        # Chen et al. arXiv:2302.06675 (symbolic-search "EvoLved sign
        # momentum"): sign updates, ONE moment instead of Adam's two —
        # half the optimizer memory — and strong vision-training results;
        # paper recipe: lr ~3-10x smaller than AdamW, wd ~3-10x larger.
        b1, b2 = opts.pop("betas", (0.9, 0.99))
        return optax.lion(lr, b1=float(b1), b2=float(b2),
                          weight_decay=float(opts.pop("weight_decay", 0.0)))
    if name in ("muon",):
        # Jordan et al. 2024 (kellerjordan.github.io/posts/muon): momentum
        # orthogonalized by Newton-Schulz iteration. The NS step is 5 small
        # MATMULS per 2-D weight — it runs on the MXU, making this the most
        # TPU-native of the modern optimizers. Non-2-D params (biases,
        # norms, embeddings) fall through to AdamW inside optax's impl.
        from optax import contrib as _contrib
        # optax partitions params: 2-D kernels take the muon chain, the
        # rest (biases/norms/embeddings/conv kernels) an internal AdamW —
        # `weight_decay` must reach BOTH or a CNN would silently lose
        # nearly all decay (override the fallback's via adam_weight_decay)
        wd = float(opts.pop("weight_decay", 0.0))
        return _contrib.muon(
            lr, beta=float(opts.pop("beta", 0.95)),
            ns_steps=int(opts.pop("ns_steps", 5)),
            weight_decay=wd,
            nesterov=bool(opts.pop("nesterov", True)),
            adam_b1=float(opts.pop("adam_b1", 0.9)),
            adam_b2=float(opts.pop("adam_b2", 0.999)),
            adam_weight_decay=float(opts.pop("adam_weight_decay", wd)))
    if name in ("schedule_free_adamw",):
        # Defazio et al. arXiv:2405.15682 ("The Road Less Scheduled"):
        # interpolation/averaging replaces the LR schedule entirely — no
        # horizon needed up front, so open-ended/preemptible training needs
        # no schedule re-tuning. Gradients are taken at an interpolated
        # point y while the AVERAGED iterate x is what you evaluate:
        # train() detects this optimizer and routes validation/serving
        # through optax's schedule_free_eval_params automatically.
        from optax import contrib as _contrib
        if callable(lr):
            raise ValueError(
                "schedule_free_adamw REPLACES the LR schedule (that is the "
                "point) — set scheduler: null and pass a flat lr (+ optional "
                "optimizer_opts warmup_steps)")
        b1, b2 = opts.pop("betas", (0.9, 0.999))
        return _contrib.schedule_free_adamw(
            lr, warmup_steps=int(opts.pop("warmup_steps", 0)) or None,
            b1=float(b1), b2=float(b2),
            weight_decay=float(opts.pop("weight_decay", 0.0)))
    raise ValueError(f"Unknown optimizer '{name}' (known: adamw, adam, sgd, "
                     f"rmsprop, lamb, lars, adafactor, lion, muon, "
                     f"schedule_free_adamw, or pass a factory)")


def _schedule_free_eval_params(opt_state, params):
    """optax's ``schedule_free_eval_params`` requires the ScheduleFreeState
    itself, but gradient clipping / accumulation wrap it in chain/MultiSteps
    tuples — locate it wherever it sits in the (possibly nested) state."""
    from optax.contrib import ScheduleFreeState, schedule_free_eval_params

    def find(s):
        if isinstance(s, ScheduleFreeState):
            return s
        if isinstance(s, (tuple, list)):       # chains + NamedTuple states
            for c in s:
                r = find(c)
                if r is not None:
                    return r
        inner = getattr(s, "inner_opt_state", None)  # MultiSteps et al.
        return find(inner) if inner is not None else None

    sf = find(opt_state)
    if sf is None:
        raise ValueError("schedule_free optimizer requested but no "
                         "ScheduleFreeState found in opt_state")
    return schedule_free_eval_params(sf, params)


# --------------------------------------------------------------------------- #
# The training procedure
# --------------------------------------------------------------------------- #

def _as_preprocessed(ds) -> PreprocessedDataset:
    return ds if isinstance(ds, PreprocessedDataset) else PreprocessedDataset(ds)


def train(hp: Mapping[str, Any], model, losses, datasets: Mapping[str, Any],
          backend_conf: Optional[BackendConfig] = None,
          metrics: Optional[Mapping[str, Callable]] = None,
          eval_metrics: Optional[Mapping[str, Callable]] = None,
          events: Optional[TrainingEvents] = None,
          loggers: Sequence[Any] = (),
          param_regularizer: Optional[Callable] = None,
          init_variables: Optional[Mapping[str, Any]] = None
          ) -> Tuple[TrainState, Dict[str, Any]]:
    """Run the full training procedure; returns (final_state, history).

    Args mirror the reference ``train()`` (ignite_training.py:178):
      * ``hp``: training hyperparameters (TRAINING_HP_DEFAULTS applied);
      * ``model``: a DeepcvModule (or any object with .init/.apply/.input_shape);
      * ``losses``: WeightedLosses / callable / mapping of named losses,
        called as ``loss(logits, targets)``;
      * ``datasets``: {'trainset': ..., 'validset': ..., ['testset': ...]};
      * ``backend_conf``: mesh/topology (defaults to all local devices);
      * ``eval_metrics``: metrics computed ONLY in the validation pass (on
        top of ``metrics``) — for expensive ranked/sequential metrics like
        detection mAP that must not ride inside the jitted gradient step;
      * ``param_regularizer``: optional ``fn(params) -> scalar`` added to the
        training loss (weight penalties, NAS expected-latency terms — the
        validation loss stays the pure task loss).
    """
    hp, _ = to_hyperparameters(dict(hp), TRAINING_HP_DEFAULTS)
    # reference parity: pipelines configure the backend through
    # hp['backend_conf'] (classification/image.py:68); an explicit
    # backend_conf argument wins
    backend = backend_conf or BackendConfig(**dict(hp.get("backend_conf") or {}))
    events = events or TrainingEvents()
    if not isinstance(losses, WeightedLosses):
        losses = WeightedLosses(losses, weights=hp.get("losses_weights"))
    metrics = dict(metrics or {"accuracy": accuracy})
    eval_metrics = {**metrics, **dict(eval_metrics or {})}

    rank0 = backend.rank == 0
    # ONE base seed for everything replicated: under multi-controller GSPMD
    # every process runs the SAME global program over the SAME global state,
    # so params init, the shuffle permutation, and the step RNG must be
    # bit-identical on every host (a torch-style per-rank seed offset would
    # silently diverge params and overlap data shards). Per-sample
    # augmentation decorrelation comes from fold_in(sample position) INSIDE
    # the program, not from per-host seeds.
    seed = int(hp["seed"])
    root_rng = jax.random.PRNGKey(seed)

    trainset = _as_preprocessed(datasets["trainset"])
    validset = _as_preprocessed(datasets.get("validset", datasets.get("testset",
                                                                      datasets["trainset"])))
    batch_size = int(hp["batch_size"])
    global_batch = batch_size  # hp batch_size is the GLOBAL batch
    epochs = int(hp["epochs"])

    # ---------------- data path selection ---------------------------------- #
    data_bytes = trainset.dataset.images.nbytes
    resident = hp["device_resident_dataset"]
    if resident == "auto":
        # memmap datasets are larger-than-RAM by contract: stream them
        resident = (data_bytes <= 2 * 1024 ** 3
                    and backend.process_count == 1
                    and not isinstance(trainset.dataset.images, np.memmap))
    if resident and len(trainset) < global_batch:
        raise ValueError(
            f"batch_size={global_batch} exceeds the trainset size "
            f"{len(trainset)}: zero steps per epoch (reduce batch_size)")

    # UDA semi-supervised mode (arXiv:1904.12848; reference README TODO
    # :130 "Use UDA ... with a custom model distilled from SinGAN"):
    # unlabeled images join the RESIDENT train pool with target -1 — the
    # exact-epoch sampler then mixes labeled/unlabeled rows per batch, the
    # supervised CE masks negative labels (losses.cross_entropy_loss), and
    # the loss adds a sharpened-teacher consistency term on unlabeled rows.
    uda_cfg = dict(hp.get("uda") or {})
    unlabeledset = datasets.get("unlabeledset")
    if uda_cfg:
        if unlabeledset is None:
            raise ValueError("hp['uda'] set but datasets['unlabeledset'] "
                             "missing (pass an ArrayDataset or image array)")
        if not resident:
            raise ValueError("uda requires the device-resident data path "
                             "(device_resident_dataset: true)")
        from deepcv_tpu.data.datasets import ArrayDataset as _ADS
        from deepcv_tpu.data.pipeline import _unwrap as _unwrap_ds
        base_ds = _unwrap_ds(trainset)
        li = np.asarray(base_ds.images)
        lt = np.asarray(base_ds.targets)
        if lt.ndim != 1 or not np.issubdtype(lt.dtype, np.integer):
            raise ValueError("uda needs integer class targets "
                             f"(got targets of shape {lt.shape}, {lt.dtype})")
        if not np.issubdtype(lt.dtype, np.signedinteger):
            # the -1 unlabeled sentinel must be representable: on uint8 it
            # would wrap to 255 and silently disable the consistency mask
            lt = lt.astype(np.int32)
        ui = np.asarray(unlabeledset.images
                        if hasattr(unlabeledset, "images") else unlabeledset)
        if ui.shape[1:] != li.shape[1:]:
            raise ValueError(f"unlabeled image shape {ui.shape[1:]} != "
                             f"labeled {li.shape[1:]}")
        merged_train = _ADS(
            np.concatenate([li, ui.astype(li.dtype)]),
            np.concatenate([lt, np.full(len(ui), -1, lt.dtype)]),
            classes=base_ds.classes, name=f"{base_ds.name}_uda",
            provenance=getattr(base_ds, "provenance", "real"))
        _logger.info("UDA: %d labeled + %d unlabeled rows in the train pool",
                     len(li), len(ui))
    elif unlabeledset is not None:
        raise ValueError("datasets['unlabeledset'] present but hp['uda'] not "
                         "set — pass uda: {weight: ...} to enable it")

    device_ds = DeviceDataset(merged_train if uda_cfg else trainset,
                              global_batch,
                              sharding=backend.replicated_sharding) if resident else None
    if not resident and global_batch % backend.process_count:
        raise ValueError(f"batch_size={global_batch} must divide evenly over "
                         f"{backend.process_count} processes")
    # streaming multi-host: each process loads ITS global_batch/k rows; the
    # prefetcher assembles them into the global sharded batch
    iterator = None if resident else BatchIterator(
        trainset, global_batch // backend.process_count, shuffle=True,
        seed=seed, process_index=backend.rank,
        process_count=backend.process_count)
    steps_per_epoch = (device_ds.steps_per_epoch if resident else len(iterator))

    # ---------------- optimizer & schedule --------------------------------- #
    hp_plain = hp.to_dict()
    schedules = build_schedules(hp.get("scheduler"), hp_plain, steps_per_epoch)
    schedule = schedules.get("lr")
    extra_schedules = {k: v for k, v in schedules.items() if k != "lr"}
    tx = build_optimizer(hp.get("optimizer", "adamw"), hp["optimizer_opts"],
                         schedule, extra_schedules=extra_schedules or None,
                         runtime_lr=bool(hp.get("runtime_lr", False)))
    if hp.get("flatten_optimizer", False):
        # one fused update over a single raveled vector instead of one tiny
        # kernel per parameter tensor: profiling the ResNet-50 train step
        # showed ~103 launch-bound per-tensor update kernels costing ~25% of
        # step time; flattened, the optimizer runs at HBM bandwidth. Off by
        # default: it changes the opt_state tree (checkpoints embed it) and
        # per-leaf sharding rules (ZeRO-1) need the per-tensor layout.
        tx = optax.flatten(tx)
    lr_scales = hp.get("lr_scales")
    if lr_scales:
        # per-layer LR scales apply to the optimizer's OUTPUT updates —
        # exactly "this block steps k x slower", whatever the optimizer
        tx = optax.chain(tx, scale_updates_by_path(lr_scales))
    clip = hp.get("gradient_clip_norm")
    if clip:
        # clip BEFORE the optimizer transform chain (the norm the clip sees
        # is the raw gradient's, as torch clip_grad_norm_ before step) and
        # BEFORE the arch-params mask wraps tx: inside the mask the global
        # norm covers only the trainable (non-arch) leaves, matching
        # torch's clip-over-trainable-params semantics
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    if not hp.get("train_arch_params", True):
        # NAS supernets whose architecture distribution is trained OUTSIDE
        # the gradient loop (ENAS RL controller): arch__ logits get zero
        # updates here; everything else trains normally
        from deepcv_tpu.search.nas import arch_params_mask
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), arch_params_mask),
            optax.masked(tx, functools.partial(arch_params_mask, invert=True)))
    freeze_re = hp.get("freeze_params")
    if freeze_re:
        # transfer learning / fine-tuning: zero updates for every param
        # whose '/'-joined tree path matches the regex (e.g. 'backbone',
        # '^(?!.*fully_connected)' for train-head-only) — the generic form
        # of the shared-image-block freeze semantics (spec/module.py
        # frozen_mask). Params/momenta still exist; only updates stop.
        import re as _re
        pat = _re.compile(str(freeze_re))

        def freeze_mask(params, invert=False):
            flat, treedef = jax.tree_util.tree_flatten_with_path(params)
            leaves = []
            for path, _leaf in flat:
                p = "/".join(str(getattr(k, "key", k)) for k in path)
                hit = bool(pat.search(p))
                leaves.append(hit if not invert else not hit)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        tx = optax.chain(
            optax.masked(optax.set_to_zero(), freeze_mask),
            optax.masked(tx, functools.partial(freeze_mask, invert=True)))
    accum = int(hp.get("grad_accumulation_steps", 1) or 1)
    if accum > 1:
        # large effective batches without the HBM for them: gradients average
        # over k micro-steps, params update on the k-th (optax MultiSteps)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    # ---------------- state init / resume ---------------------------------- #
    init_rng, state_rng = jax.random.split(root_rng)
    # init_variables: warm-start from existing weights (transfer learning /
    # QAT fine-tuning) — must match the model's param tree. COPY the leaves:
    # the jitted scans donate the whole TrainState, so threading the caller's
    # arrays in directly would delete them out from under the caller (and
    # break reusing the same init_variables for a second train() call).
    variables = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                       dict(init_variables)) \
        if init_variables is not None else model.init(init_rng)
    ema_decay = hp.get("ema_decay")
    ema_decay = float(ema_decay) if ema_decay is not None else None
    # ---------------- flat parameter storage (r4 verdict #3) --------------- #
    # hp 'flat_params': params (and batch stats) are BORN as one contiguous
    # raveled vector each — the forward unravels them (slices that fuse into
    # consumers), gradients arrive flat through the slicing's transpose, and
    # the optimizer/EMA/stat-EMA updates each run as ONE fused kernel over
    # one buffer instead of ~one launch-bound kernel per tensor (the
    # measured ~26 ms/step bucket of the ResNet-50 BN profile, design.md
    # §5.15; reference analogue: the per-param optimizer.step() loop,
    # ignite_training.py:252-254). Off by default: checkpoints embed the
    # layout, and per-tensor sharding rules (TP/ZeRO) don't apply to it.
    flat_mode = bool(hp.get("flat_params", False))
    p_unravel = bs_unravel = None
    if flat_mode:
        if backend.zero or getattr(backend, "tensor_parallel", 1) > 1:
            raise ValueError("flat_params: incompatible with ZeRO/tensor "
                             "parallelism (their sharding rules are "
                             "per-tensor); use the default tree storage")
        if hp.get("lr_scales") or hp.get("freeze_params") \
                or not hp.get("train_arch_params", True):
            raise ValueError("flat_params: incompatible with path-based "
                             "parameter masks (lr_scales / freeze_params / "
                             "train_arch_params=False)")
        # per-TENSOR optimizers silently change semantics on one raveled
        # leaf: lamb/lars layerwise trust ratios collapse to one global
        # scalar, adafactor's factored stats and muon's 2-D orthogonalized
        # momentum never engage on a 1-D vector. Refuse loudly — the flag's
        # contract is "a layout experiment, never semantics".
        _opt_name = hp.get("optimizer", "adamw")
        if isinstance(_opt_name, str) and _opt_name.rsplit(".", 1)[-1] \
                .lower() in ("lamb", "lars", "adafactor", "muon"):
            raise ValueError(f"flat_params: optimizer '{_opt_name}' is "
                             "per-tensor (trust ratios / factored stats / "
                             "2-D orthogonalization) and would silently "
                             "change dynamics on a raveled vector")
        from jax.flatten_util import ravel_pytree
        init_params, p_unravel = ravel_pytree(variables["params"])
        init_bs = variables.get("batch_stats")
        if init_bs is not None:
            init_bs, bs_unravel = ravel_pytree(init_bs)
    else:
        init_params = variables["params"]
        init_bs = variables.get("batch_stats")
    state = TrainState(params=init_params,
                       batch_stats=init_bs,
                       opt_state=tx.init(init_params),
                       step=jnp.zeros((), jnp.int32),
                       rng=state_rng,
                       # jnp.copy: the EMA must not ALIAS the live params —
                       # the jitted scans donate the whole state, and two
                       # pytree leaves sharing one donated buffer is invalid
                       ema_params=jax.tree_util.tree_map(jnp.copy,
                                                         init_params)
                       if ema_decay is not None else None)
    if hp["resume_from"]:
        state = resume_from_path(hp["resume_from"], state)
        _logger.info("Resumed from %s at step %d", hp["resume_from"], int(state.step))

    # place state over the mesh: replicated, TP-sharded kernels when the
    # backend has a 'model' axis (BackendConfig(tensor_parallel=...)), and/or
    # ZeRO-1 data-sharded optimizer moments (BackendConfig(zero=True)). The
    # same tree pins the jitted steps' OUTPUT sharding so the layout contract
    # survives compilation (otherwise GSPMD propagates the moment sharding
    # into the updated params — correct math, but checkpointing/eval assume
    # the declared placement).
    state_shd = backend.state_sharding(state)
    state = jax.device_put(state, state_shd)

    if backend.zero:
        # checkpointing needs a fully-addressable state: ZeRO shards the
        # optimizer moments across PROCESSES, and device_get of a cross-host
        # shard raises — regather to replicated first (one compiled
        # all-gather at checkpoint cadence; found by the 2-process ZeRO test)
        _regather = jax.jit(lambda s: s,
                            out_shardings=backend.replicated_sharding)

        def host_state(s):
            return jax.device_get(_regather(s))
    else:
        def host_state(s):
            return jax.device_get(s)
    dtype = hp.get("dtype")
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)

    # ---------------- the jitted step --------------------------------------- #
    self_target = hp.get("self_supervised_target") == "input"
    # AugMix JSD consistency training (arXiv:1912.02781; reference contrastive
    # JSD + AugMix recipe flow): forward the clean batch plus k AugMix views,
    # add weighted JS-divergence between their predictions to the task loss.
    jsd_cfg = dict(hp.get("augmix_jsd") or {})
    jsd_weight = float(jsd_cfg.get("weight", 12.0)) if jsd_cfg else 0.0

    # MoE blocks sow their load-balance aux into this collection (present in
    # the init variables iff the model has MoE); making it mutable in the
    # train-mode apply is how the sown values reach the loss
    from deepcv_tpu.ops.moe import MOE_LOSSES_COLLECTION

    def _params_have_moe(tree) -> bool:
        # warm starts (init_variables) usually carry only params/batch_stats
        # — detect MoE from the param tree too, or a fine-tune would
        # silently train with zero load-balance pressure
        if not hasattr(tree, "items"):
            return False
        return any(k == "moe_mlp" or _params_have_moe(v)
                   for k, v in tree.items())

    has_moe = (MOE_LOSSES_COLLECTION in variables
               or _params_have_moe(variables.get("params")))
    moe_aux_w = float(hp.get("moe_aux_weight", 0.01) or 0.0) if has_moe else 0.0

    def _apply(variables, x, key):
        cols = [c for c in ("batch_stats", MOE_LOSSES_COLLECTION)
                if c in variables or (c == MOE_LOSSES_COLLECTION and has_moe)]
        return model.apply(variables, x, train=True,
                           rngs={"dropout": key, "nas": jax.random.fold_in(key, 7)},
                           mutable=cols or False)

    if hp.get("remat"):
        # rematerialize the forward in the backward pass: activations are
        # recomputed instead of held in HBM — the standard TPU memory/FLOP
        # trade for deep models or big images. remat: true recomputes
        # everything; remat: 'dots' keeps matmul/conv OUTPUTS resident and
        # recomputes only the cheap elementwise tail (XLA's
        # dots_with_no_batch_dims_saveable — the usual transformer policy:
        # most of the memory saving at a fraction of the recompute FLOPs).
        remat = hp["remat"]
        if remat in (True, 1, "all", "full"):
            _apply = jax.checkpoint(_apply)
        elif remat in ("dots", "dots_saveable"):
            _apply = jax.checkpoint(
                _apply,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        else:
            raise ValueError(f"remat must be true|'all'|'dots', got {remat!r}")

    def _forward(params, batch_stats, x, key):
        if flat_mode:
            # unravel the flat buffers into the model's tree: 1-D slices
            # that XLA fuses into their consumers; grads w.r.t. the flat
            # params arrive flat through this slicing's transpose
            params = p_unravel(params)
            if batch_stats is not None and bs_unravel is not None:
                batch_stats = bs_unravel(batch_stats)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        out = _apply(variables, x, key)
        return out if isinstance(out, tuple) else (out, {})

    mixup_a = float(hp.get("mixup_alpha") or 0.0)
    cutmix_a = float(hp.get("cutmix_alpha") or 0.0)
    mixing = (mixup_a > 0 or cutmix_a > 0) and not self_target
    if mixing and jsd_cfg:
        # the JSD consistency anchor would be the logits of the MIXED batch
        # compared against AugMix views of the CLEAN input — two different
        # label distributions; refuse instead of silently corrupting both
        raise ValueError("mixup/cutmix cannot combine with augmix_jsd: the "
                         "JSD anchor must be the clean batch (disable one)")
    if uda_cfg and (self_target or jsd_cfg or mixing):
        raise ValueError("uda cannot combine with self_supervised_target, "
                         "augmix_jsd, or mixup/cutmix — each redefines what "
                         "the batch's anchor/labels mean (disable the others)")

    def loss_fn(params, batch_stats, raw_x, y, key):
        x = trainset.batch_transform(raw_x, key=key)
        if dtype is not None:
            x = x.astype(dtype)
        perm = lam = None
        if mixing:
            from deepcv_tpu.data.augmentation import (cutmix_batch,
                                                      mixup_batch)
            mkey = jax.random.fold_in(key, 909)
            if mixup_a > 0 and cutmix_a > 0:
                pick = jax.random.bernoulli(jax.random.fold_in(mkey, 1))
                x, perm, lam = jax.lax.cond(
                    pick,
                    lambda xx: cutmix_batch(xx, mkey, cutmix_a),
                    lambda xx: mixup_batch(xx, mkey, mixup_a), x)
            elif cutmix_a > 0:
                x, perm, lam = cutmix_batch(x, mkey, cutmix_a)
            else:
                x, perm, lam = mixup_batch(x, mkey, mixup_a)
        logits, new_state = _forward(params, batch_stats, x, key)
        y_t = x if self_target else trainset.transform_targets(y)
        if mixing:
            # convex loss combination: works with any (logits, labels) loss,
            # no soft-target plumbing; terms mix with the same weights
            main_a, terms_a = losses(logits, y_t)
            main_b, terms_b = losses(logits, jnp.take(y_t, perm, axis=0))
            main = lam * main_a + (1.0 - lam) * main_b
            terms = {k: lam * terms_a[k] + (1.0 - lam) * terms_b[k]
                     for k in terms_a}
            terms["main_loss"] = main
        else:
            main, terms = losses(logits, y_t)
        if moe_aux_w and MOE_LOSSES_COLLECTION in new_state:
            aux_leaves = jax.tree_util.tree_leaves(
                new_state[MOE_LOSSES_COLLECTION])
            moe_aux = sum(jnp.mean(a) for a in aux_leaves) / len(aux_leaves)
            main = main + moe_aux_w * moe_aux
            terms = dict(terms)
            terms["moe_aux"] = moe_aux
            terms["main_loss"] = main
        if jsd_cfg:
            from deepcv_tpu.data.augmentation import augment_and_mix
            from deepcv_tpu.data.transforms import to_tensor
            from deepcv_tpu.train.losses import \
                jensen_shannon_divergence_consistency_loss as jsd
            base = to_tensor(raw_x)
            aug_logits = []
            for k in range(int(jsd_cfg.get("views", 2))):
                akey = jax.random.fold_in(key, 101 + k)
                xa = augment_and_mix(
                    base, akey, severity=int(jsd_cfg.get("severity", 3)),
                    width=int(jsd_cfg.get("width", 3)),
                    depth=int(jsd_cfg.get("depth", -1)),
                    ops=tuple(jsd_cfg["ops"]) if jsd_cfg.get("ops") else None)
                if trainset.transform is not None:
                    xa = trainset.transform(xa, akey)
                if dtype is not None:
                    xa = xa.astype(dtype)
                la, _ = _forward(params, batch_stats, xa, akey)
                aug_logits.append(la)
            consistency = jsd(logits, *aug_logits)
            terms = dict(terms)
            terms["jsd_consistency"] = consistency
            main = main + jsd_weight * consistency
            terms["main_loss"] = main
        if uda_cfg:
            # UDA (arXiv:1904.12848), FixMatch-style views: the TEACHER is
            # the main forward (weak view = the trainset's own recipe,
            # stop-gradient, sharpened by 1/T); the STUDENT sees a strong
            # AugMix view. KL(teacher || student) on unlabeled rows above
            # the confidence threshold joins the masked supervised CE.
            from deepcv_tpu.data.augmentation import augment_and_mix
            from deepcv_tpu.data.transforms import to_tensor
            akey = jax.random.fold_in(key, 4242)
            xa = augment_and_mix(
                to_tensor(raw_x), akey,
                severity=int(uda_cfg.get("severity", 3)),
                width=int(uda_cfg.get("width", 3)),
                depth=int(uda_cfg.get("depth", -1)),
                ops=tuple(uda_cfg["ops"]) if uda_cfg.get("ops") else None)
            if trainset.transform is not None:
                xa = trainset.transform(xa, akey)
            if dtype is not None:
                xa = xa.astype(dtype)
            student_logits, _ = _forward(params, batch_stats, xa, akey)
            t_logits = jax.lax.stop_gradient(logits).astype(jnp.float32)
            temp = float(uda_cfg.get("temperature", 0.4))
            p_teacher = jax.nn.softmax(t_logits / temp, axis=-1)
            conf = jnp.max(jax.nn.softmax(t_logits, axis=-1), axis=-1)
            thr = float(uda_cfg.get("confidence_threshold", 0.0))
            unlabeled = y < 0
            m = (unlabeled & (conf >= thr)).astype(jnp.float32)
            logq = jax.nn.log_softmax(student_logits.astype(jnp.float32), -1)
            kl = jnp.sum(p_teacher * (jnp.log(jnp.maximum(p_teacher, 1e-12))
                                      - logq), axis=-1)
            cons = jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)
            main = main + float(uda_cfg.get("weight", 1.0)) * cons
            terms = dict(terms)
            terms["uda_consistency"] = cons
            terms["uda_masked_frac"] = jnp.mean(m)
            # built-in per-step accuracy would count unlabeled rows as
            # errors; report the labeled-row accuracy explicitly
            lm = (~unlabeled).astype(jnp.float32)
            hits = (jnp.argmax(logits, -1) == jnp.maximum(y, 0)).astype(
                jnp.float32)
            terms["labeled_accuracy"] = (jnp.sum(hits * lm)
                                         / jnp.maximum(jnp.sum(lm), 1.0))
            terms["main_loss"] = main
        if param_regularizer is not None:
            # regularizers are written against the param TREE; under
            # flat_params hand them the unraveled view (XLA CSEs the
            # duplicate slices with _forward's)
            main = main + param_regularizer(
                p_unravel(params) if flat_mode else params)
            terms["main_loss"] = main
        return main, (terms, new_state.get("batch_stats"), logits, y_t)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    log_grad_norm = bool(hp.get("log_grad_norm", True))

    def train_step(state: TrainState, raw_x, y):
        rng, step_key = jax.random.split(state.rng)
        (_, (terms, new_bs, logits, y_t)), grads = grad_fn(
            state.params, state.batch_stats, raw_x, y, step_key)
        if flat_mode and new_bs is not None:
            # model.apply returned the updated stats as a tree; re-ravel so
            # the carry stays one buffer (same treedef as init => same order)
            from jax.flatten_util import ravel_pytree as _rp
            new_bs = _rp(new_bs)[0]
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step_metrics = dict(terms)
        if log_grad_norm:
            # observability parity with the reference's per-iteration gradient
            # histograms (GradsHistHandler, ignite_training.py:278-283) at TPU
            # cost: one scalar reduction fused into the step, no host traffic
            step_metrics["grad_norm"] = optax.global_norm(grads)
        for mname, mfn in metrics.items():
            step_metrics[mname] = mfn(logits, y_t)
        new_ema = state.ema_params
        if ema_decay is not None:
            if accum > 1:
                # only move the EMA when MultiSteps actually applied an
                # update (mini_step wrapped to 0) — updating every
                # micro-step toward unchanged params would compound the
                # decay to ema_decay^k per real optimizer step
                did_update = new_opt.mini_step == 0
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: jnp.where(
                        did_update, ema_decay * e + (1.0 - ema_decay) * p, e),
                    state.ema_params, new_params)
            else:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    state.ema_params, new_params)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1,
                                  rng=rng, ema_params=new_ema)
        return new_state, step_metrics

    sampling = str(hp.get("sampling", "epoch"))
    data_shd = backend.data_sharding()
    if resident:
        # dataset arrays enter the jitted programs as ARGUMENTS, not closure
        # constants — capturing them makes XLA embed the whole dataset at
        # compile time (minutes for CIFAR-sized arrays).
        #
        # Scanning a whole logging window into ONE device program removes the
        # ~100ms/step host-dispatch wall on tunneled TPUs (measured: 40k ->
        # millions img/s). Both variants return chunk-mean metrics.
        def scan_steps_epoch(state: TrainState, images, targets,
                             perms, epoch0_step, n_steps: int):
            """Exact-epoch scan: ``perms[e]`` is epoch ``e``'s on-device
            permutation (rows cover the fused-epoch block); each step slices
            its batch from the permutation, so every sample is visited exactly
            once per epoch (reference DataLoader semantics)."""
            spe, bs = device_ds.steps_per_epoch, device_ds.batch_size

            def body(st, _):
                rng, step_key = jax.random.split(st.rng)
                rel = st.step - epoch0_step
                idx = jax.lax.dynamic_slice(
                    perms, (rel // spe, (rel % spe) * bs), (1, bs))[0]
                raw_x = device_ds._unflatten(jnp.take(images, idx, axis=0))
                y = jnp.take(targets, idx, axis=0)
                return train_step(st.replace(rng=rng), raw_x, y)

            state, ms = jax.lax.scan(body, state, None, length=n_steps)
            return state, jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), ms)

        def scan_steps_uniform(state: TrainState, images, targets, n_steps: int):
            """With-replacement scan (opt-in ``sampling='with_replacement'``):
            uniform random batch indices, no epoch semantics."""
            def body(st, _):
                rng, batch_key = jax.random.split(st.rng)
                raw_x, y = device_ds.batch_for_step(batch_key, images, targets)
                return train_step(st.replace(rng=rng), raw_x, y)

            state, ms = jax.lax.scan(body, state, None, length=n_steps)
            return state, jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), ms)

        if sampling == "with_replacement":
            jit_scan = jax.jit(scan_steps_uniform, static_argnums=(3,),
                               donate_argnums=(0,),
                               out_shardings=(state_shd, None))
        else:
            jit_scan = jax.jit(scan_steps_epoch, static_argnums=(5,),
                               donate_argnums=(0,),
                               out_shardings=(state_shd, None))
        # epoch permutations are keyed by (seed, epoch index) alone, so exact
        # resume replays the same data order without extra checkpoint state
        perm_key = jax.random.PRNGKey(seed ^ 0x5EED)
        make_perms = jax.jit(
            lambda epochs_arr: jax.vmap(
                lambda e: jax.random.permutation(
                    jax.random.fold_in(perm_key, e), device_ds.n))(epochs_arr))
    else:
        jit_step = jax.jit(train_step, donate_argnums=(0,),
                           in_shardings=(None, data_shd, data_shd),
                           out_shardings=(state_shd, None))
        # staged streaming: scan over k staged batches in ONE dispatch,
        # amortizing the per-dispatch round trip. On THIS tunneled single
        # chip the streamed path is transfer-bound (~53 MB/s over the
        # tunnel: 17.2k -> 17.6k img/s with staging), but on a co-located
        # host the dispatch wall is what binds and staging removes it
        stage_shd = NamedSharding(backend.mesh,
                                  PartitionSpec(None, backend.data_axis))

        def scan_steps_staged(state: TrainState, xs, ys):
            st, ms = jax.lax.scan(
                lambda st, xy: train_step(st, xy[0], xy[1]), state, (xs, ys))
            return st, jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), ms)

        jit_stage = jax.jit(scan_steps_staged, donate_argnums=(0,),
                            in_shardings=(None, stage_shd, stage_shd),
                            out_shardings=(state_shd, None))

    eval_with_ema = ema_decay is not None and bool(hp.get("ema_eval", True))
    # schedule-free optimizers evaluate at the AVERAGED iterate x, not the
    # gradient point the param tree holds (arXiv:2405.15682) — route every
    # validation forward through optax's eval-params transform. Detect with
    # the same identifier normalization build_optimizer applies, so dotted
    # or cased spellings can't train schedule-free but eval raw weights.
    sf_eval = (isinstance(hp.get("optimizer"), str)
               and str(hp["optimizer"]).rsplit(".", 1)[-1].lower()
                      .startswith("schedule_free"))
    if sf_eval and ema_decay is not None:
        raise ValueError(
            "schedule_free_adamw already evaluates/serves an averaged "
            "iterate (arXiv:2405.15682) — combining it with ema_decay "
            "would average the raw gradient-point iterates instead; set "
            "ema_decay: null")

    def _eval_variables(state: TrainState):
        v = state.variables(ema=eval_with_ema)
        if sf_eval:
            v = dict(v, params=_schedule_free_eval_params(
                state.opt_state, state.params))
        if flat_mode:
            v = dict(v, params=p_unravel(v["params"]))
            if v.get("batch_stats") is not None and bs_unravel is not None:
                v["batch_stats"] = bs_unravel(v["batch_stats"])
        return v

    def eval_step(state: TrainState, raw_x, y, n_valid: Tuple[int, ...]):
        """Eval on a batch where host i's block holds ``n_valid[i]`` real
        samples at its head; the rest are wrap-around padding that keeps
        shapes static (pipeline.py). The forward runs on the full padded
        batch (sharding-friendly), losses and metrics on the statically
        gathered real rows — so partial batches never double-count samples.
        ``n_valid`` takes only two values per dataset (full / tail), i.e. at
        most one extra compile.

        Uses the VALIDSET's own transforms (preprocess() attaches the same
        non-augmenting chain to every split, but a caller-supplied validset
        with different transforms must not be preprocessed like trainset).

        ``n_valid`` is the PER-HOST real-count tuple; under multi-host
        assembly the global batch is host-major blocks, so the real rows are
        gathered from the head of each block. Per-host counts DIFFER on the
        tail batch when ``len(validset) % process_count != 0`` — every
        sample is counted exactly once on any world size."""
        x = validset.batch_transform(raw_x, augment=False)
        if dtype is not None:
            x = x.astype(dtype)
        logits = model.apply(_eval_variables(state), x, train=False)
        y_t = x if self_target else validset.transform_targets(y)
        k = backend.process_count
        block = x.shape[0] // k
        real = jnp.concatenate([i * block + jnp.arange(c)
                                for i, c in enumerate(n_valid)])
        logits, y_t = logits[real], y_t[real]
        _, terms = losses(logits, y_t)
        out = dict(terms)
        for mname, mfn in eval_metrics.items():
            out[mname] = mfn(logits, y_t)
        return out

    jit_eval = jax.jit(eval_step, static_argnums=(3,),
                       in_shardings=(None, data_shd, data_shd))

    # ---------------- checkpointing ---------------------------------------- #
    out_dir = Path(hp["output_path"]) / (hp.get("run_dir") or _run_dir_name(backend))
    ckpt = None
    if int(hp["save_every_iters"]) > 0:
        # EVERY process participates (orbax coordinates multi-process saves
        # internally and writes each replicated array once) — a rank-0-only
        # gate deadlocks multi-host runs on orbax's global sync barrier,
        # caught by tests/test_multihost.py. The torch reference's
        # rank-0-only convention (ignite_training.py:278) maps to orbax's
        # primary-writer election, not to skipping the call.
        ckpt = CheckpointManager(out_dir / "checkpoints",
                                 save_every_iters=int(hp["save_every_iters"]),
                                 best_k=int(hp["keep_best_models"]),
                                 metric_name=next(iter(metrics)))

    # ---------------- validation -------------------------------------------- #
    eval_bs = min(int(hp["eval_batch_multiplier"]) * batch_size, len(validset))
    # eval batch must split evenly over the mesh's data axis
    eval_bs = max(backend.n_devices, (eval_bs // backend.n_devices) * backend.n_devices)

    def run_validation(state) -> Dict[str, float]:
        acc = MetricAccumulator()
        k = backend.process_count
        ebs_local = eval_bs // k
        it = BatchIterator(validset, ebs_local, shuffle=False, drop_last=False,
                           process_index=backend.rank,
                           process_count=backend.process_count)
        # batch-major split (pipeline.py): global batch b holds rows
        # [b*gbs, (b+1)*gbs) of the dataset, host i the i-th block — so the
        # real (non-padding) rows per host follow directly from the global
        # tail position, and every sample is counted exactly once
        gbs = ebs_local * k
        for b, (raw_x, y) in enumerate(
                prefetch_to_device(it.epoch(0), sharding=data_shd)):
            r = min(gbs, len(validset) - b * gbs)
            n_valid = tuple(max(0, min(ebs_local, r - i * ebs_local))
                            for i in range(k))
            acc.update(jit_eval(state, raw_x, y, n_valid),
                       weight=sum(n_valid))
        return {f"valid_{k}": v for k, v in acc.compute().items()}

    # ---------------- the loop ---------------------------------------------- #
    history: Dict[str, Any] = {"train": [], "valid": [], "throughput_img_s": [],
                               # where checkpoints/artifacts land — identical
                               # on every host (rank-0 timestamp broadcast)
                               "run_dir": str(out_dir)}
    crash_at = int(hp["crash_iteration"])
    log_every = max(1, int(hp["log_progress_every_iters"]))
    train_acc = MetricAccumulator()
    step = int(state.step)
    t_start = time.perf_counter()

    validate_every = max(1, int(hp["validate_every_epochs"]))
    # consecutive epochs with no validation/logging in between can run as ONE
    # device dispatch (another ~3x on tunneled hosts at bench scale); the
    # exact-epoch sampler passes one permutation row per fused epoch
    fuse_epochs = int(hp.get("max_epochs_per_dispatch", 1))

    def flush_train_log(at_step):
        """Shared by both loop branches: emit accumulated train metrics at
        log_every boundaries."""
        if at_step % log_every == 0:
            vals = train_acc.compute()
            train_acc.reset()
            history["train"].append({"step": at_step, **vals})
            if rank0:
                _logger.info("step %d  %s", at_step, " ".join(
                    f"{k}={v:.4f}" for k, v in vals.items()))
                for lg in loggers:
                    lg.log_metrics(vals, step=at_step)

    def check_preempted(at_step, cur_state):
        """Graceful-preemption check, called at every host-visible step
        boundary in both loop branches: on SIGTERM/request_preemption(),
        checkpoint the CURRENT state (the loop variables are exactly at
        ``at_step`` here) and stop with Preempted. The flag is cleared so the
        follow-up resume invocation starts clean."""
        if not _PREEMPTION.is_set():
            return
        _PREEMPTION.clear()
        where = ""
        if ckpt is not None:
            ckpt.save(at_step, host_state(cur_state))
            where = f" (checkpoint in {out_dir / 'checkpoints'})"
            if rank0:
                _logger.warning("preempted: checkpointed step %d under %s",
                                at_step, out_dir)
        raise Preempted(f"SIGTERM: training stopped at step {at_step}{where}")

    # SIGTERM -> flag (handler only valid on the main thread; elsewhere —
    # e.g. train() driven from a worker thread — request_preemption() is the
    # entry point). The previous handler is restored on exit.
    # sentinel, not None: signal.signal() legitimately returns None when the
    # prior handler was installed outside Python — restoring must still happen
    # (to SIG_DFL) or this loop's handler would leak past train()
    prev_sigterm = _HANDLER_NOT_INSTALLED
    if hp["handle_preemption"] and \
            threading.current_thread() is threading.main_thread():
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda signum, frame: _PREEMPTION.set())

    sync_every = max(1, int(hp.get("sync_every_dispatches", 1)))
    window_t0 = time.perf_counter()
    window_seen = 0
    dispatch_i = 0
    throughput = 0.0

    try:
        epoch = step // max(1, steps_per_epoch)
        while epoch < epochs:
            n_fused = 1
            if resident and fuse_epochs > 1:
                while (n_fused < fuse_epochs and epoch + n_fused < epochs
                       and (epoch + n_fused) % validate_every != 0):
                    n_fused += 1
            n_seen = 0
            # exact resume: skip batches already done within the resumed epoch
            skip = step % steps_per_epoch if step else 0
            # save boundaries must be computed identically on EVERY process
            # (chunk is a static jit arg; rank-0-only ckpt would give rank 0
            # different scan lengths than the others and desynchronize the
            # global programs) — only the actual save below is rank-0-gated
            save_every = int(hp["save_every_iters"])
            if resident:
                epoch_end = step + (n_fused * steps_per_epoch - skip)
                if sampling != "with_replacement":
                    # one permutation row per fused epoch, generated on device
                    perms = make_perms(jnp.arange(epoch, epoch + n_fused))
                    epoch0_step = jnp.asarray(epoch * steps_per_epoch, jnp.int32)
                while step < epoch_end:
                    if crash_at >= 0 and step == crash_at:
                        raise CrashIteration(f"Injected crash at iteration {crash_at}")
                    check_preempted(step, state)
                    # next host-visible boundary: log, checkpoint, crash, epoch end
                    bounds = [epoch_end, (step // log_every + 1) * log_every]
                    if save_every > 0:
                        bounds.append((step // save_every + 1) * save_every)
                    if crash_at > step:
                        bounds.append(crash_at)
                    target = min(b for b in bounds if b > step)
                    chunk = target - step
                    if sampling == "with_replacement":
                        state, m = jit_scan(state, device_ds.images,
                                            device_ds.targets, chunk)
                    else:
                        state, m = jit_scan(state, device_ds.images,
                                            device_ds.targets, perms,
                                            epoch0_step, chunk)
                    step = target
                    n_seen += chunk * global_batch
                    train_acc.update(m, weight=chunk)
                    flush_train_log(step)
                    events.fire(TrainingEvents.ITERATION_COMPLETED, count=step,
                                state=state, metrics=m)
                    # gate the host transfer on the save boundary: device_get
                    # pulls the full TrainState and blocks, which would stall
                    # the async-dispatch pipeline on every chunk otherwise
                    if ckpt and save_every > 0 and step % save_every == 0:
                        ckpt.save(step, host_state(state))
            else:
                epoch_batches = _streaming_epoch(iterator, trainset, epoch, skip,
                                                 hp, backend, seed)
                # reference 'prefetch_batches' hp: depth of the H2D double buffer
                depth = 2 if hp.get("prefetch_batches", True) else 1
                stage_k = max(1, int(hp.get("stream_scan_batches", 8) or 1))
                wire = hp.get("wire_compression", False)
                batches = prefetch_to_device(
                    epoch_batches, size=depth * stage_k, sharding=data_shd,
                    wire_codec=({"bits": 3, "axis": -2} if wire is True
                                else dict(wire) if wire else None))
                bit = iter(batches)
                exhausted = False
                while not exhausted:
                    if crash_at >= 0 and step == crash_at:
                        raise CrashIteration(f"Injected crash at iteration {crash_at}")
                    check_preempted(step, state)
                    # next host-visible boundary cuts the staged group so
                    # logging/checkpoint/crash cadences are step-exact
                    bounds = [(step // log_every + 1) * log_every]
                    if save_every > 0:
                        bounds.append((step // save_every + 1) * save_every)
                    if crash_at > step:
                        bounds.append(crash_at)
                    chunk = min(stage_k, min(bounds) - step)
                    buf_x, buf_y = [], []
                    while len(buf_x) < chunk:
                        try:
                            bx, by = next(bit)
                        except StopIteration:
                            exhausted = True
                            break
                        buf_x.append(bx)
                        buf_y.append(by)
                    if not buf_x:
                        break
                    k = len(buf_x)
                    if k == stage_k and stage_k > 1:
                        # full group: ONE dispatch scanning k steps; the
                        # group-mean metrics enter the accumulator with
                        # weight k (same convention as the resident chunks)
                        state, m = jit_stage(state, jnp.stack(buf_x),
                                             jnp.stack(buf_y))
                        train_acc.update(m, weight=k)
                    else:
                        # ragged tail (or stage_k=1): per-batch dispatch
                        # keeps one compiled program for any tail length
                        for bx, by in zip(buf_x, buf_y):
                            state, m = jit_step(state, bx, by)
                            train_acc.update(m, weight=1)
                    step += k
                    n_seen += k * global_batch
                    flush_train_log(step)
                    # fire once per LOGICAL step (group-mean metrics) so
                    # event subscribers keep per-iteration cadence no matter
                    # what stream_scan_batches is
                    for s in range(step - k + 1, step + 1):
                        events.fire(TrainingEvents.ITERATION_COMPLETED,
                                    count=s, state=state, metrics=m)
                    if ckpt and save_every > 0 and step % save_every == 0:
                        ckpt.save(step, host_state(state))

            dispatch_i += 1
            window_seen += n_seen
            synced = False
            at_end = epoch + n_fused >= epochs
            at_validation = (epoch + n_fused) % validate_every == 0
            if (dispatch_i <= 2 or at_end or at_validation
                    or (dispatch_i - 2) % sync_every == 0):
                # force a REAL host sync for honest timing: on tunneled
                # backends block_until_ready can return before remote
                # execution finishes; pulling a scalar through device_get
                # cannot be faked. Between syncs (sync_every_dispatches > 1)
                # dispatch groups queue asynchronously and one throughput
                # entry covers the whole window.
                step_on_device = int(jax.device_get(state.step))
                assert step_on_device == step, (step_on_device, step)
                dt = time.perf_counter() - window_t0
                throughput = window_seen / dt if dt > 0 else 0.0
                history["throughput_img_s"].append(throughput)
                window_seen = 0
                synced = True

            epoch += n_fused
            # validation on EPOCH_COMPLETED (fixes reference's EPOCH_STARTED
            # scheduling bug, SURVEY §8 / ignite_training.py:291)
            val = {}
            if epoch % validate_every == 0:
                val = run_validation(state)
                history["valid"].append({"epoch": epoch, **val})
                events.fire(TrainingEvents.VALIDATION_COMPLETED, count=epoch,
                            state=state, metrics=val)
                for lg in loggers:
                    lg.log_metrics(val, step=step)
                if hp.get("log_param_histograms") and rank0:
                    # TensorBoard weight histograms (reference
                    # WeightsHistHandler parity) — host pull, so only at
                    # validation boundaries, never per step
                    flat = jax.tree_util.tree_flatten_with_path(
                        jax.device_get(state.params))[0]
                    for lg in loggers:
                        if hasattr(lg, "log_histogram"):
                            for path, leaf in flat:
                                lg.log_histogram(
                                    jax.tree_util.keystr(path), leaf, step)
                if ckpt:
                    key0 = f"valid_{next(iter(metrics))}"
                    if key0 in val:
                        ckpt.update_best(step, val[key0], host_state(state))
            if rank0:
                _logger.info("epoch %d/%d  %.1f img/s  %s", epoch, epochs,
                             throughput,
                             " ".join(f"{k}={v:.4f}" for k, v in val.items()))
            events.fire(TrainingEvents.EPOCH_COMPLETED, count=epoch,
                        state=state, metrics=val, throughput=throughput)
            if synced:
                # restart the window clock only AFTER validation, checkpoint
                # saves, logging and event subscribers: throughput windows
                # must cover dispatch time only (advisor r4: stamping at the
                # sync point charged validation wall time to the next window,
                # understating every post-validation window)
                window_t0 = time.perf_counter()
        # flush train metrics accumulated past the last log_every boundary
        # (otherwise the final partial window never reaches history/sinks —
        # and short runs with fewer steps than log_every would log nothing)
        tail_vals = train_acc.compute()
        if tail_vals:
            train_acc.reset()
            history["train"].append({"step": step, **tail_vals})
            if rank0:
                for lg in loggers:
                    lg.log_metrics(tail_vals, step=step)
    finally:
        # a SIGTERM that lands after the last boundary check can no longer be
        # honored by THIS loop — drop it so a follow-up train() (resume, next
        # trial) does not spuriously stop at its first step
        _PREEMPTION.clear()
        if prev_sigterm is not _HANDLER_NOT_INSTALLED:
            signal.signal(signal.SIGTERM,
                          signal.SIG_DFL if prev_sigterm is None
                          else prev_sigterm)
        for lg in loggers:
            if hasattr(lg, "flush"):
                lg.flush()
        if ckpt:
            ckpt.close()

    history["total_time_s"] = time.perf_counter() - t_start
    history["steps"] = step
    history["output_path"] = str(out_dir)
    if sf_eval and state.ema_params is None:
        # park the schedule-free AVERAGED iterate in the EMA slot so the
        # serving path (`state.variables(ema=True)`, run --export) ships
        # eval weights; params/opt_state stay raw so resume keeps training
        state = state.replace(ema_params=_schedule_free_eval_params(
            state.opt_state, state.params))
    events.fire(TrainingEvents.COMPLETED, count=1, state=state, history=history)
    return state, history


def _streaming_epoch(iterator, trainset, epoch, skip, hp, backend, seed):
    """One epoch of host batches: the C++ ring-buffer loader when available
    (hp 'native_loader', default auto: single-process + lib importable), else
    the numpy BatchIterator. Both honor the exact-resume skip."""
    import itertools

    use_native = hp.get("native_loader", "auto")
    if use_native in ("auto", True) and backend.process_count == 1:
        try:
            from deepcv_tpu.runtime import NativeBatchLoader, native_available
            if native_available():
                data = trainset.dataset if hasattr(trainset, "dataset") else trainset
                loader = NativeBatchLoader(data.images, data.targets,
                                           iterator.batch_size, depth=3,
                                           seed=seed + epoch)
                n = iterator.num_batches
                def gen():
                    try:
                        for i in range(n):
                            b = next(loader)
                            if i >= skip:
                                yield b
                    finally:
                        loader.close()
                return gen()
        except Exception as e:  # pragma: no cover
            _logger.debug("native loader unavailable (%s); numpy path", e)
        if use_native is True:
            raise RuntimeError("native_loader=True but libdeepcv_io unavailable")
    batches = iterator.epoch(epoch)
    return itertools.islice(batches, skip, None) if skip else batches


def _run_dir_name(backend: BackendConfig) -> str:
    """Output dir named from experiment + datetime + backend string
    (reference ``add_training_output_dir``, ignite_training.py:124-135).

    Multi-host: every process derives paths from this name (checkpoints,
    crash-retry resume), so the timestamp must be rank-0's — two hosts
    straddling a second boundary would otherwise silently write to
    different run dirs."""
    import datetime
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    if backend.process_count > 1:  # pragma: no cover (multi-host only)
        from jax.experimental import multihost_utils
        buf = np.frombuffer(stamp.encode().ljust(24), dtype=np.uint8).copy()
        stamp = bytes(multihost_utils.broadcast_one_to_all(buf)) \
            .rstrip(b" \x00").decode()
    return f"run_{stamp}_{backend}"


if __name__ == "__main__":  # per-module self-test CLI (reference parity)
    import sys
    from pathlib import Path
    _repo = Path(__file__).resolve()
    while _repo.name != "deepcv_tpu":
        _repo = _repo.parent
    sys.path.insert(0, str(_repo.parent))
    from deepcv_tpu.utils import test_module_cli
    test_module_cli(__file__)


def train_with_retries(hp: Mapping[str, Any], model, losses, datasets,
                       max_retries: int = 2, **kwargs):
    """Fault-tolerant wrapper: on a crash mid-training, resume from the run's
    latest checkpoint and continue (up to ``max_retries`` times).

    The reference had NO elasticity (SURVEY §5.3: "world is fixed at
    init_process_group"); here recovery is checkpoint-resume in-process —
    checkpointing must be on (``save_every_iters`` > 0) for retries to make
    progress. Returns (state, history) of the successful attempt.

    Resume is scoped to THE RUN DIRECTORY THIS CALL CREATED (a unique
    ``run_dir`` pinned up front), never to checkpoints of other concurrent or
    previous runs under the same output_path; a crash before the first
    periodic save (checkpoint dir exists but holds no restorable step)
    re-raises the ORIGINAL exception instead of burning retries on a
    FileNotFoundError.
    """
    import datetime
    import os as _os
    import uuid

    hp = dict(hp)
    if int(hp.get("save_every_iters", TRAINING_HP_DEFAULTS["save_every_iters"])) <= 0:
        raise ValueError("train_with_retries requires save_every_iters > 0")
    if not hp.get("run_dir"):
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        hp["run_dir"] = f"run_{stamp}_{_os.getpid()}_{uuid.uuid4().hex[:6]}"
        backend = kwargs.get("backend_conf")
        if backend is not None and getattr(backend, "process_count", 1) > 1:
            # pid/uuid diverge across hosts: adopt rank-0's name so every
            # process resumes from the SAME checkpoint dir
            from jax.experimental import multihost_utils
            buf = np.frombuffer(hp["run_dir"].encode().ljust(64),
                                np.uint8).copy()
            hp["run_dir"] = bytes(multihost_utils.broadcast_one_to_all(buf)) \
                .rstrip(b" \x00").decode()
    ckpt_dir = (Path(hp.get("output_path", TRAINING_HP_DEFAULTS["output_path"]))
                / hp["run_dir"] / "checkpoints")
    for attempt in range(max_retries + 1):
        try:
            return train(hp, model, losses, datasets, **kwargs)
        except Preempted:
            # the host is being evicted — retrying in-process is pointless
            # and would outlive the SIGTERM grace window; the checkpoint is
            # already written, a fresh invocation resumes it
            raise
        except Exception as e:  # noqa: BLE001 — deliberate catch-all recovery
            latest = None
            if (ckpt_dir / "steps").exists():
                try:
                    mgr = CheckpointManager(ckpt_dir)
                    latest = mgr.latest_step
                    mgr.close()
                except Exception:  # unreadable/corrupt manager dir
                    latest = None
            if attempt >= max_retries or latest is None:
                raise  # re-raise the ORIGINAL failure, chained context intact
            hp["resume_from"] = str(ckpt_dir)
            hp["crash_iteration"] = -1  # do not re-inject the test fault
            _logger.warning("training attempt %d failed (%s); resuming from %s "
                            "at step %d", attempt + 1, e, ckpt_dir, latest)
    raise AssertionError("unreachable")  # pragma: no cover
