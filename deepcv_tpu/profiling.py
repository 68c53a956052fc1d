"""Profiling & tracing utilities (SURVEY §5.1 parity and beyond).

Reference had: per-node kedro ``log_time`` (pipeline.py:24,43 — built into
our pipeline runner), GPU stats on progress bars, and a TODO for a merged
torch profiler (README.md:156). TPU-native replacements:

  * :func:`trace` — context manager around ``jax.profiler`` producing XProf
    traces viewable in TensorBoard/Perfetto;
  * :func:`annotate` — named trace spans (``jax.profiler.TraceAnnotation``);
  * :class:`StepTimer` — cheap wall-clock step/epoch timing with summary
    stats;
  * :func:`device_memory_stats` — live HBM usage per device;
  * tensorboard server start/stop helpers (reference utils.py:112-153).
"""
from __future__ import annotations

import contextlib
import logging
import statistics
import subprocess
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "annotate", "StepTimer", "device_memory_stats",
           "check_determinism", "forced_sync_time", "mfu_report",
           "model_flops", "PEAK_BF16_FLOPS",
           "start_tensorboard_server", "stop_tensorboard_server"]

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir="data/04_training/profile", create_perfetto_link: bool = False):
    """Capture an XProf/TensorBoard trace of everything inside the block.

    View with ``tensorboard --logdir <log_dir>`` (profile plugin) or upload
    the .trace.json.gz to ui.perfetto.dev.
    """
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        _logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named span visible in profiler traces:
    ``with annotate('augment'): ...``"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summary (host-side, cheap)."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {"n": len(ts), "mean_s": statistics.fmean(ts),
                "p50_s": ts[len(ts) // 2], "p95_s": ts[int(len(ts) * 0.95)],
                "max_s": ts[-1]}


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live memory stats (bytes) where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {k: int(v) for k, v in stats.items()
                           if isinstance(v, (int, float))}
    return out


def check_determinism(fn, *args, n_runs: int = 2, atol: float = 0.0):
    """Run ``fn`` n times on identical inputs and compare outputs exactly —
    the TPU-native 'race detector' (SURVEY §5.2: the reference had none; XLA
    programs are deterministic, so ANY divergence indicates a host-side race
    or an uncaptured RNG). Returns max abs deviation; raises on mismatch."""
    import numpy as np
    ref = jax.tree_util.tree_map(lambda a: np.asarray(a), fn(*args))
    worst = 0.0
    for i in range(1, n_runs):
        out = jax.tree_util.tree_map(lambda a: np.asarray(a), fn(*args))
        leaves_a = jax.tree_util.tree_leaves(ref)
        leaves_b = jax.tree_util.tree_leaves(out)
        for a, b in zip(leaves_a, leaves_b):
            d = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))) \
                if a.size else 0.0
            worst = max(worst, d)
            if d > atol:
                raise AssertionError(
                    f"Non-determinism detected on run {i}: max deviation {d} > {atol} "
                    "(host-side race or uncaptured randomness)")
    return worst


_TB_PROCESS: Optional[subprocess.Popen] = None


def start_tensorboard_server(logdir="data/04_training", port: int = 6006):
    """Launch a background tensorboard server (reference
    ``start_tensorboard_server``, utils.py:112-153). Returns the Popen."""
    global _TB_PROCESS
    if _TB_PROCESS is not None and _TB_PROCESS.poll() is None:
        return _TB_PROCESS
    _TB_PROCESS = subprocess.Popen(
        ["tensorboard", "--logdir", str(logdir), "--port", str(port),
         "--bind_all"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    _logger.info("tensorboard started on :%d (logdir=%s)", port, logdir)
    return _TB_PROCESS


def stop_tensorboard_server():
    global _TB_PROCESS
    if _TB_PROCESS is not None and _TB_PROCESS.poll() is None:
        _TB_PROCESS.terminate()
        try:
            _TB_PROCESS.wait(timeout=10)
        except subprocess.TimeoutExpired:  # pragma: no cover
            _TB_PROCESS.kill()
    _TB_PROCESS = None


# --------------------------------------------------------------------------- #
# MFU / roofline reporting
# --------------------------------------------------------------------------- #

#: peak dense bf16 FLOP/s per chip by jax device_kind (public spec sheets)
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def forced_sync_time(fn, *args, n: int = 20) -> float:
    """Mean wall seconds per call with a FORCED host sync: on tunneled
    backends ``block_until_ready`` can return before remote execution
    finishes, but pulling a scalar through ``device_get`` cannot be faked
    (docs/design.md §5.4). Warm-up call included before timing."""
    import time as _time

    def _sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

    _sync(fn(*args))
    t0 = _time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (_time.perf_counter() - t0) / n


def mfu_report(fn, *args, flops: Optional[float] = None, n: int = 20,
               peak_flops: Optional[float] = None) -> Dict[str, Any]:
    """Measure a callable end to end and report model-FLOPs utilization.

    ``fn`` is jitted if it is not already; FLOPs default to XLA's cost
    analysis of the lowered program (each dot/conv counted as 2*MACs — the
    standard model-FLOPs convention), ``peak_flops`` to the current chip's
    public bf16 peak (None => MFU is None, e.g. on CPU). Returns
    {'seconds', 'flops', 'tflops_per_s', 'mfu', 'device_kind'}.

    Measurement protocol (round-3 findings, docs/design.md §5.9): times are
    forced-sync WARM draws — run the report once to compile, then trust the
    repeat; cold-session numbers on shared chips can read ~15 % low from
    compile contention.
    """
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    if flops is None:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    kind = jax.devices()[0].device_kind
    peak = peak_flops if peak_flops is not None else PEAK_BF16_FLOPS.get(kind)
    secs = forced_sync_time(jfn, *args, n=n)
    return {"seconds": secs, "flops": flops,
            "tflops_per_s": flops / secs / 1e12,
            "mfu": (flops / secs / peak) if peak else None,
            "device_kind": kind}


def model_flops(model, batch_size: int = 1, dtype=jnp.float32,
                train: bool = False) -> Dict[str, Any]:
    """Static model profile WITHOUT executing anything: parameter count +
    XLA cost analysis (FLOPs, HBM bytes accessed) of the AOT-lowered
    forward — the TPU-native answer to the reference README's model-
    profiling TODO (torchprof/torch-scan/THOP merge,
    /root/reference/README.md:156). Everything comes from ``eval_shape`` +
    ``jit(...).lower(...).compile()`` on abstract values, so profiling a
    600M-param model allocates no memory.

    Returns {'params', 'flops', 'flops_per_image', 'bytes_accessed',
    'batch_size'} (flops follow XLA's 2*MACs convention).
    """
    import numpy as _np

    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    x_spec = jax.ShapeDtypeStruct((int(batch_size), *model.input_shape),
                                  dtype)

    def fwd(v, x):
        if train:
            return model.apply(v, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)})
        return model.apply(v, x, train=False)

    cost = jax.jit(fwd).lower(var_shapes, x_spec).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):       # older jax returns [dict]
        cost = cost[0]
    n_params = sum(int(_np.prod(a.shape)) for a in
                   jax.tree_util.tree_leaves(var_shapes.get("params", {})))
    flops = float(cost.get("flops", 0.0))
    return {"params": n_params, "flops": flops,
            "flops_per_image": flops / int(batch_size),
            "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
            "batch_size": int(batch_size)}
