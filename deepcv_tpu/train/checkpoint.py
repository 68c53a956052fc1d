"""Checkpointing: every-N-steps saves, best-k by validation metric, resume.

Reference parity: ignite Checkpoint machinery —
``to_save = {trainer, model, optimizer[, scheduler]}`` every
``save_every_iters`` + best-3 by val accuracy + ``resume_from``
(/root/reference/src/deepcv/meta/ignite_training.py:263-276, 325, 393-399).

TPU-native: Orbax CheckpointManager over the full TrainState pytree
{params, batch_stats, opt_state, step} — one artifact covers what the
reference split across trainer/model/optimizer objects.
"""
from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]

_logger = logging.getLogger(__name__)


class CheckpointManager:
    """Step checkpoints + best-k tracking in one directory.

    Layout::

        <dir>/steps/<step>/...      periodic saves (keep latest ``keep``)
        <dir>/best/<step>/...       best-k by the tracked metric
        <dir>/best/index.json       metric values of kept best checkpoints
    """

    def __init__(self, directory, save_every_iters: int = 1000, keep: int = 3,
                 best_k: int = 3, metric_name: str = "accuracy", mode: str = "max",
                 async_save: bool = True):
        self.dir = Path(directory)
        self.async_save = bool(async_save)
        self.save_every_iters = int(save_every_iters)
        self.best_k = int(best_k)
        self.metric_name = metric_name
        self.mode = mode
        self._mgr = ocp.CheckpointManager(
            (self.dir / "steps").absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=int(keep),
                                                 create=True))
        self._best_dir = self.dir / "best"
        self._best_dir.mkdir(parents=True, exist_ok=True)
        self._best_index_path = self._best_dir / "index.json"
        self._best: Dict[str, float] = {}
        if self._best_index_path.exists():
            self._best = json.loads(self._best_index_path.read_text())

    # ------------------------------------------------------------- periodic
    def maybe_save(self, step: int, state) -> bool:
        if self.save_every_iters <= 0 or step % self.save_every_iters != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state):
        """Checkpoint at ``step``. With ``async_save`` (default) orbax copies
        the arrays to host synchronously (donation-safe) and persists to disk
        in the background — the train loop's next scan chunk overlaps the
        write; ``restore``/``close`` join the pending write first."""
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def restore(self, state_template=None, step: Optional[int] = None):
        """Restore latest (or given step); ``state_template=None`` returns the
        raw pytree dict (useful for inference-only restores that do not carry
        optimizer state templates)."""
        self._mgr.wait_until_finished()   # join any in-flight async save
        step = int(step) if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.dir / 'steps'}")
        args = ocp.args.StandardRestore(_host_template(state_template)) \
            if state_template is not None else ocp.args.StandardRestore()
        return self._mgr.restore(step, args=args)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # ------------------------------------------------------------- best-k
    def update_best(self, step: int, metric_value: float, state) -> bool:
        """Save into best/ if metric ranks in the top-k (reference
        ``save_best_model_by_val_score``, ignite_training.py:325)."""
        better = (lambda a, b: a > b) if self.mode == "max" else (lambda a, b: a < b)
        if len(self._best) >= self.best_k:
            worst_step, worst_val = min(
                self._best.items(), key=lambda kv: kv[1] if self.mode == "max" else -kv[1])
            if not better(metric_value, worst_val):
                return False
            shutil.rmtree(self._best_dir / worst_step, ignore_errors=True)
            del self._best[worst_step]
        path = (self._best_dir / str(int(step))).absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        self._best[str(int(step))] = float(metric_value)
        self._best_index_path.write_text(json.dumps(self._best))
        return True

    def best_checkpoints(self) -> Dict[str, float]:
        return dict(self._best)

    def restore_best(self, state_template=None):
        if not self._best:
            raise FileNotFoundError("No best checkpoints recorded")
        key = max if self.mode == "max" else min
        best_step = key(self._best, key=self._best.get)
        ckptr = ocp.StandardCheckpointer()
        path = (self._best_dir / best_step).absolute()
        out = ckptr.restore(path, target=state_template) if state_template is not None \
            else ckptr.restore(path)
        return out

    def close(self):
        self._mgr.wait_until_finished()   # join any in-flight async save
        self._mgr.close()


def _host_template(template):
    """Template with jax.Array leaves replaced by HOST numpy copies: orbax
    then restores plain numpy, which ``jax.device_put`` can place onto ANY
    global sharding afterwards. Restoring straight into jax.Array templates
    resurrects the SAVING run's per-device sharding metadata — on multi-host
    that demands an unsupported cross-host transfer at the device_put
    (caught by tests/test_multihost.py crash-resume)."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, template)


def resume_from_path(path, state_template=None):
    """Reference ``_resume_training`` parity (ignite_training.py:393-399):
    load a checkpoint from an explicit path (into state_template's structure
    when given, else as a raw pytree dict)."""
    p = Path(path)
    if (p / "steps").exists():  # a manager dir: restore latest
        mgr = CheckpointManager(p)
        out = mgr.restore(state_template)
        mgr.close()
        return out
    ckptr = ocp.StandardCheckpointer()
    if state_template is not None:
        return ckptr.restore(p.absolute(), target=_host_template(state_template))
    return ckptr.restore(p.absolute())
