"""Device/distribution topology — the TPU-native BackendConfig.

Reference parity: ``deepcv.meta.ignite_training.BackendConfig``
(/root/reference/src/deepcv/meta/ignite_training.py:78-117) recorded device +
torch.distributed process-group topology (dist_backend/dist_url/local_rank/
rank/ngpus/nnodes). The TPU-native equivalent is a ``jax.sharding.Mesh`` over
all addressable chips plus named shardings:

  * DDP                    == batch axis sharded over mesh axis 'data'
  * gradient allreduce     == psum over 'data' (XLA-inserted / shard_map)
  * SyncBatchNorm          == lax.pmean of batch stats over 'data'
  * DistributedSampler     == per-process index sharding (data.pipeline)
  * rank-0-only logging    == jax.process_index() == 0

Multi-host (DCN) initialization goes through ``jax.distributed.initialize``
when coordinator env vars are present.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["BackendConfig"]

_logger = logging.getLogger(__name__)


class BackendConfig:
    """Mesh + sharding record for one training run.

    Args mirror the reference YAML ``backend_conf`` entries where meaningful;
    torch-specific ones (dist_backend NCCL/Gloo, dist_url, local_rank) are
    accepted and ignored with a debug log so reference configs run unchanged.
    """

    def __init__(self, device: Optional[str] = None,
                 mesh_shape: Optional[Sequence[int]] = None,
                 axis_names: Sequence[str] = ("data",),
                 n_devices: Optional[int] = None,
                 tensor_parallel: int = 1,
                 slices: int = 1,
                 zero: bool = False,
                 distributed: bool = False,
                 # --- reference-compat kwargs (ignored on TPU) ---
                 dist_backend: Optional[str] = None, dist_url: Optional[str] = None,
                 local_rank: Optional[int] = None, ngpus: Optional[int] = None,
                 **ignored):
        for k, v in dict(dist_backend=dist_backend, dist_url=dist_url,
                         local_rank=local_rank, ngpus=ngpus, **ignored).items():
            if v is not None:
                _logger.debug("BackendConfig: torch-specific option %s=%r ignored "
                              "(TPU mesh handles distribution)", k, v)
        # Multi-host init MUST happen before ANY backend query (jax.devices /
        # process_count would initialize the runtime and lock out the
        # coordinator), so gate on env + flag only.
        if distributed and "JAX_COORDINATOR_ADDRESS" in os.environ:
            try:  # pragma: no cover (multi-host only)
                # jax auto-detects coordinator_address/local_device_ids from
                # env but num_processes/process_id only via cluster plugins
                # (SLURM & co) — honor the generic env vars too so plain
                # process launchers (and the 2-process CPU test) work
                np_env = os.environ.get("JAX_NUM_PROCESSES") or None
                pid_env = os.environ.get("JAX_PROCESS_ID") or None
                jax.distributed.initialize(
                    num_processes=int(np_env) if np_env else None,
                    process_id=int(pid_env) if pid_env else None)
            except (RuntimeError, ValueError) as e:
                # already initialized, or half-configured env (one of
                # NUM_PROCESSES/PROCESS_ID unset) — single-process fallback
                _logger.debug("jax.distributed.initialize skipped: %s", e)

        devices = jax.devices(device) if device else jax.devices()
        if n_devices:
            devices = devices[:n_devices]
        # multi-slice (DCN) topology: order devices slice-major so that model
        # (TP) groups NEVER straddle a slice boundary — TP collectives are
        # per-layer and must ride ICI; only the coarse 'data' gradient
        # allreduce may cross the slow DCN link, once per step. Real
        # multi-slice platforms expose .slice_index; single-slice/CPU meshes
        # treat contiguous device blocks as slices (simulation).
        self.slices = int(slices)
        if self.slices > 1:
            if len(devices) % self.slices:
                raise ValueError(f"slices={slices} does not divide "
                                 f"{len(devices)} devices")
            per_slice = len(devices) // self.slices
            if any(getattr(d, "slice_index", None) is not None for d in devices):
                devices = sorted(devices,
                                 key=lambda d: (getattr(d, "slice_index", 0), d.id))
            if int(tensor_parallel) > 1 and per_slice % int(tensor_parallel):
                raise ValueError(
                    f"tensor_parallel={tensor_parallel} must divide the "
                    f"per-slice device count {per_slice} (TP collectives "
                    "cannot cross the DCN slice boundary)")
        self.devices = devices
        self.tensor_parallel = int(tensor_parallel)
        self.zero = bool(zero)
        self.axis_names = tuple(axis_names)
        if self.tensor_parallel > 1 and mesh_shape is None \
                and self.axis_names == ("data",):
            # dp x tp mesh: batch over 'data', kernel out-features over 'model'
            if len(devices) % self.tensor_parallel:
                raise ValueError(f"tensor_parallel={tensor_parallel} does not "
                                 f"divide {len(devices)} devices")
            self.axis_names = ("data", "model")
            mesh_shape = (len(devices) // self.tensor_parallel,
                          self.tensor_parallel)
        if mesh_shape is None:
            mesh_shape = (len(devices),) + (1,) * (len(self.axis_names) - 1)
        mesh_shape = tuple(int(s) for s in mesh_shape)
        if int(np.prod(mesh_shape)) != len(devices):
            raise ValueError(f"mesh_shape {mesh_shape} does not cover {len(devices)} devices")
        self.mesh = Mesh(np.asarray(devices).reshape(mesh_shape), self.axis_names)

    # ------------------------------------------------------------ properties
    @property
    def n_devices(self) -> int:
        return len(self.devices)

    @property
    def is_cpu(self) -> bool:
        return self.devices[0].platform == "cpu"

    @property
    def is_tpu(self) -> bool:
        return self.devices[0].platform in ("tpu", "axon")

    @property
    def rank(self) -> int:
        """Process index (reference 'rank'; rank-0-only side effects)."""
        return jax.process_index()

    @property
    def process_count(self) -> int:
        return jax.process_count()

    @property
    def is_distributed(self) -> bool:
        return self.n_devices > 1 or self.process_count > 1

    @property
    def data_axis(self) -> str:
        return self.axis_names[0]

    def data_sharding(self, ndim: int = 1) -> NamedSharding:
        """Sharding for a batch tensor: dim 0 split over the data axis.

        The spec names only dim 0 — unnamed trailing dims are replicated, so
        one sharding fits any rank (images and labels alike)."""
        return NamedSharding(self.mesh, P(self.data_axis))

    @property
    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def state_sharding(self, state) -> Any:
        """Sharding pytree for the full TrainState.

        Replicated by default. Two opt-in layout changes compose:

        * ``tensor_parallel`` (>1 'model' mesh axis): every 'kernel' leaf —
          params AND their optimizer moments, which mirror the params tree
          inside optax states — is column-parallel on its output-features
          dim (Megatron-style, parallel.py rules). XLA inserts the matching
          collectives in the jitted train step; activations stay
          batch-sharded so the TP all-gathers ride the 'model' axis only.
        * ``zero=True`` (ZeRO-1, arXiv:1910.02054): OPTIMIZER-STATE leaves
          are additionally sharded over the 'data' axis on dim 0 — each
          data-parallel replica materializes only its slice of the Adam
          moments between steps (params stay replicated, so the forward/
          backward is untouched; GSPMD turns the optimizer update into
          compute-your-shard + all-gather, which is exactly ZeRO-1's
          communication pattern). Layout only — trajectories are
          bit-compatible with the replicated run.
        """
        model_axis = dict(self.mesh.shape).get("model", 1)
        data_axis = dict(self.mesh.shape).get(self.data_axis, 1)
        if model_axis <= 1 and not (self.zero and data_axis > 1):
            return self.replicated_sharding

        def rule(path, leaf):
            last = str(getattr(path[-1], "key", path[-1])) if path else ""
            root = str(getattr(path[0], "name",
                               getattr(path[0], "key", path[0]))) if path else ""
            ndim = getattr(leaf, "ndim", 0)
            spec = [None] * ndim
            if model_axis > 1 and last == "kernel" and ndim >= 2 \
                    and leaf.shape[-1] % model_axis == 0 \
                    and leaf.shape[-1] // model_axis >= 2:
                spec[-1] = "model"
            if self.zero and data_axis > 1 and root == "opt_state" \
                    and ndim >= 1 and leaf.shape[0] % data_axis == 0 \
                    and spec[0] is None:
                spec[0] = self.data_axis
            if not any(spec):
                return self.replicated_sharding
            return NamedSharding(self.mesh, P(*spec))

        return jax.tree_util.tree_map_with_path(rule, state)

    def __str__(self):
        plat = self.devices[0].platform
        return (f"{plat}-x{self.n_devices}" +
                (f"-{self.slices}slices" if self.slices > 1 else "") +
                (f"-{self.process_count}hosts" if self.process_count > 1 else ""))

    def __repr__(self):
        return (f"BackendConfig(mesh={tuple(self.mesh.shape.items())}, "
                f"devices={self.n_devices}x{self.devices[0].platform}, "
                f"processes={self.process_count})")
