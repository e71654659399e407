"""Machine-telemetry probes in bench.py (r14 session 4).

The single-thread CPU probe is provably blind to all-core memory-
bandwidth degradation (fastest-ever probe_sec 0.131 recorded on a host
whose 32-core bench ran slower than a 0.179 window — BENCH_r14_c4 vs
c2), so the machine block also records an aggregate-bandwidth figure.
These tests pin the probes' contracts, not their values.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_cpu_probe_shape():
    p = bench._cpu_probe()
    assert set(p) == {"probe_sec", "steal_pct"}
    assert p["probe_sec"] > 0


def test_bw_probe_returns_positive_or_none():
    # advisory telemetry: any failure mode must collapse to None, never
    # raise into the bench
    bw = bench._bw_probe()
    assert bw is None or bw > 0


def test_bw_probe_is_repeatable_order_of_magnitude():
    a = bench._bw_probe()
    b = bench._bw_probe()
    if a is None or b is None:
        return  # environment without numpy/threads — contract still held
    # same fixed workload back-to-back: readings must agree within 4x
    # even on a bursty host (cross-window drift is the thing it measures,
    # not within-second jitter)
    assert max(a, b) / min(a, b) < 4
