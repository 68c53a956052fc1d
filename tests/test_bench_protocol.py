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
