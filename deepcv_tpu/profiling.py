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
           "xplane_op_summary", "profile_op_breakdown",
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
# --------------------------------------------------------------------------- #
# XPlane (XProf) parsing — device-side op timings without TensorBoard.
#
# jax.profiler writes *.xplane.pb (tsl XSpace proto). Neither tensorflow nor
# xplane_pb2 bindings ship in a JAX-only environment, so this decodes the
# wire format directly (the schema is tiny: XSpace.planes -> XPlane.lines ->
# XEvent{metadata_id, duration_ps} + XPlane.event_metadata{id -> name}).
# This is what turns "MFU is 31%" into "fusion.123 (conv+bn bwd) is 40% of
# device time" — the profile-first loop SURVEY §7 prescribes.
# --------------------------------------------------------------------------- #

def _pb_varint(buf: bytes, i: int):
    shift = v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _pb_fields(buf: bytes):
    """Yield (field_number, wire_type, value) from one protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _pb_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _pb_varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _pb_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:  # pragma: no cover — groups don't appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def xplane_op_summary(log_dir: str, plane_filter: str = "TPU"
                      ) -> List[Dict[str, Any]]:
    """Per-op total device time from the newest ``*.xplane.pb`` under
    ``log_dir`` (as written by :func:`trace`).

    Returns a list of ``{"plane", "line", "op", "total_ms", "count"}``
    sorted by descending time, for planes whose name contains
    ``plane_filter`` (default: the TPU device plane)."""
    paths = sorted(Path(log_dir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {log_dir}")
    space = paths[-1].read_bytes()
    rows: List[Dict[str, Any]] = []
    for fn, _wt, plane in _pb_fields(space):
        if fn != 1:                                   # XSpace.planes
            continue
        name, lines, evmeta = "", [], {}
        for pf, _pw, pv in _pb_fields(plane):
            if pf == 2:                               # XPlane.name
                name = pv.decode("utf-8", "replace")
            elif pf == 3:                             # XPlane.lines
                lines.append(pv)
            elif pf == 4:                             # event_metadata map
                mid, mname = None, ""
                for mf, _mw, mv in _pb_fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:                     # XEventMetadata
                        for ef, _ew, ev in _pb_fields(mv):
                            if ef == 1:
                                mid = ev
                            elif ef == 2:
                                mname = ev.decode("utf-8", "replace")
                if mid is not None:
                    evmeta[mid] = mname
        if plane_filter not in name:
            continue
        for line in lines:
            lname, events = "", []
            for lf, _lw, lv in _pb_fields(line):
                if lf == 2:
                    lname = lv.decode("utf-8", "replace")
                elif lf == 4:                         # XLine.events
                    events.append(lv)
            agg: Dict[int, List[float]] = {}
            for ev in events:
                mid = dur = 0
                for ef, _ew, evv in _pb_fields(ev):
                    if ef == 1:
                        mid = evv
                    elif ef == 3:                     # duration_ps
                        dur = evv
                a = agg.setdefault(mid, [0.0, 0])
                a[0] += dur
                a[1] += 1
            for mid, (ps, cnt) in agg.items():
                rows.append({"plane": name, "line": lname,
                             "op": evmeta.get(mid, str(mid)),
                             "total_ms": ps / 1e9, "count": cnt})
    rows.sort(key=lambda r: -r["total_ms"])
    return rows


def profile_op_breakdown(fn, *args, log_dir: str = "/tmp/deepcv_profile",
                         warmup: int = 1, iters: int = 3,
                         top: int = 20) -> List[Dict[str, Any]]:
    """Run ``fn(*args)`` under the profiler and return the top device ops by
    total time. ``fn`` should be jitted; its result is synced each iter."""
    for _ in range(max(0, warmup)):
        out = fn(*args)
    jax.block_until_ready(out)
    with trace(log_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    rows = [r for r in xplane_op_summary(log_dir)
            if r["line"] in ("XLA Ops", "XLA TraceMe", "Steps") or
            r["line"].startswith("XLA")]
    return rows[:top] if top else rows


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
