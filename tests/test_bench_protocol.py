"""Bench measurement-protocol helpers (r3 verdict #1/#9 regression guards).

bench.py lives at the repo root; these tests pin the steady-state rule
(median of warm windows, first two entries are warmup) so a future edit
can't silently reintroduce max-of-warm or compile-polluted numbers.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_steady_drops_two_warmup_entries_and_takes_median():
    # entry 1 = compile, entry 2 = one-time second-dispatch cost (measured
    # consistently slower on the tunneled chip) — both excluded
    assert bench.steady([10.0, 200.0, 500.0, 520.0, 480.0]) == 500.0


def test_steady_never_takes_max():
    vals = [10.0, 200.0, 400.0, 1000.0, 410.0]   # one lucky draw
    assert bench.steady(vals) == 410.0            # median, not 1000


def test_steady_short_histories():
    assert bench.steady([10.0, 500.0, 510.0]) == 505.0   # drop 1, mean of 2
    assert bench.steady([10.0, 500.0]) == 500.0          # drop compile only
    assert bench.steady([42.0]) == 42.0                  # all there is


def test_every_train_config_disables_preemption_handling():
    """The driver's timeout SIGTERM must kill the bench fast, never detour
    into a checkpoint (r3 verdict #1). Every train() hp literal in bench.py
    must carry handle_preemption: False."""
    src = Path(bench.__file__).read_text()
    assert src.count('"handle_preemption": False') >= 8
    assert '"handle_preemption": True' not in src


def test_window_tracker_streams_median_of_warm_windows():
    """r4 verdict #1: deadline-guarded extras stream a provisional
    median-of-warm-windows line so a budget expiry still leaves a number."""
    from deepcv_tpu.train.training import TrainingEvents

    lines = []
    events = bench._window_tracker(1, lambda v: {"value": v}, lines.append)
    # window values repeat between syncs (bit-exact) — repeats must not count
    for tp in [100.0, 100.0, 400.0, 400.0, 500.0, 520.0]:
        events.fire(TrainingEvents.EPOCH_COMPLETED, count=1, throughput=tp)
    # seen = [100, 400, 500, 520]; callbacks after the 2nd distinct window,
    # each the steady() of windows so far
    assert [round(ln["value"], 1) for ln in lines] == [400.0, 450.0, 510.0]


def test_run_default_uses_deadline_guard_not_cold_estimates():
    """r4 verdict #1 regression: extras must run under a SIGALRM watchdog
    sized from the REMAINING budget, never be skipped off a static cold
    estimate; and ResNet-50 (config 9, never yet in a driver artifact) must
    be attempted before the wide-classifier MFU pair."""
    import inspect
    src = inspect.getsource(bench.run_default)
    assert "signal.alarm" in src
    assert src.index("resnet50_224") < src.index("mfu_wide_bn_b256")
    # the MFU pair runs at the measured-peak batch 256 in BN and WN variants
    assert 'norm="weight_norm", batch=256' in src
    assert 'norm="batch_norm", batch=256' in src


def test_sigterm_handler_is_async_signal_safe():
    """Advisor r4: the handler must emit via os.write on a pre-serialized
    payload — print()/json.dumps in a signal handler can die on the
    buffered-writer reentrancy guard exactly when the driver times out."""
    import inspect
    src = inspect.getsource(bench.run_default)
    handler = src.split("def emit_headline_and_exit")[1].split("def ")[0]
    assert "os.write" in handler
    assert "print(json" not in handler
    assert "json.dumps" not in handler


def test_provisional_headline_threads_real_provenance():
    """r4 verdict #7: the SIGTERM-emitted provisional line must carry the
    dataset's actual provenance, not a hard-coded 'synthetic' — main()
    builds every line (final AND provisional) through one make_line that
    closes over the real provenance, streamed via the shared tracker."""
    import inspect
    src = inspect.getsource(bench.main)
    assert 'provenance = data["trainset"].dataset.provenance' in src
    assert "_window_tracker(" in src
    rd = inspect.getsource(bench.run_default)
    assert '"data": "synthetic"' not in rd   # no hard-coded provenance
