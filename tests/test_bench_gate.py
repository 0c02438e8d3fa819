"""Probe-gating of the official bench artifact (bench.py).

The r4 headline landed in a window its own bracketing probes showed ~1.9×
degraded; the gate exists so that can never silently happen again — a
degraded window either retries or ships annotated ``degraded: true``.

r5: the floor self-calibrates against the best probe seen in the invocation
(``PROBE_SELF_FRAC``) instead of an absolute pairs/sec — the sandbox VM
migrated hosts mid-round and the probe plateau moved 4.1–4.4M → ~1.7M while
Spark suite throughput was unchanged, so absolute floors don't transfer."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_clean_window_passes():
    assert bench._window_clean(
        {"pairs_per_sec": 4.3e6}, {"pairs_per_sec": 4.1e6}) == (True, None)


def test_uniformly_slower_host_is_clean():
    # post-migration plateau: ~1.7M on both brackets, nothing better seen —
    # the invocation's own best IS the host's speed; must not be flagged
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 1.76e6}, {"pairs_per_sec": 1.63e6},
        best_seen=1.76e6)
    assert ok, reason


def test_window_below_self_calibrated_floor_is_degraded():
    # an earlier attempt probed 4.3M; this window probes 2.3M on both
    # brackets (in-band with each other) — degraded vs what the host can do
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 2.33e6}, {"pairs_per_sec": 2.30e6},
        best_seen=4.3e6)
    assert not ok and "floor" in reason


def test_probe_below_absolute_floor_is_degraded():
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 0.5e6}, {"pairs_per_sec": 0.5e6}, best_seen=0.5e6)
    assert not ok and "floor" in reason


def test_r4_shape_probe_collapse_is_degraded():
    # the r4 artifact: 4.32M before, 2.33M after — must be flagged (band)
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 4.32e6}, {"pairs_per_sec": 2.33e6},
        best_seen=4.32e6)
    assert not ok


def test_steal_swing_within_band_is_clean():
    # ordinary co-tenant steal swing (4.4M → 3.44M, ratio 0.78) stays clean
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 4.4e6}, {"pairs_per_sec": 3.44e6}, best_seen=4.4e6)
    assert ok, reason


def test_disagreement_band_without_floor_breach():
    ok, reason = bench._window_clean(
        {"pairs_per_sec": 4.4e6}, {"pairs_per_sec": 3.2e6}, best_seen=4.4e6)
    assert not ok and "disagree" in reason


def test_missing_probe_never_blocks_the_bench():
    ok, reason = bench._window_clean({"error": "boom"}, {"pairs_per_sec": 1.0})
    assert ok and reason == "probe_unavailable"
