"""Probe-gating of the official bench artifact (bench.py).

The r4 headline landed in a window its own bracketing probes showed ~1.9×
degraded; the gate exists so that can never silently happen again — a
degraded window either retries or ships annotated ``degraded: true``."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_clean_window_passes():
    assert bench._window_clean(
        {"pairs_per_sec": 4.3e6}, {"pairs_per_sec": 4.1e6}) == (True, None)


def test_probe_below_floor_is_degraded():
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 2.9e6}, {"pairs_per_sec": 2.8e6})
    assert not ok and "floor" in reason


def test_r4_shape_probe_collapse_is_degraded():
    # the r4 artifact: 4.32M before, 2.33M after — must be flagged
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 4.32e6}, {"pairs_per_sec": 2.33e6})
    assert not ok


def test_disagreement_band_without_floor_breach():
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 4.4e6}, {"pairs_per_sec": 3.2e6})
    assert not ok and "disagree" in reason


def test_missing_probe_never_blocks_the_bench():
    ok, reason = bench._window_clean({"error": "boom"}, {"pairs_per_sec": 1.0})
    assert ok and reason == "probe_unavailable"
