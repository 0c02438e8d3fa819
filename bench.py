"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is candidate-pair scoring throughput (pairs/sec) over the
comparison-vector stage — the stage the north rule targets. Full evaluation is
forced with a noop write so Catalyst can't prune the scored columns away.

Scaling-efficiency evidence (N vs 4N cores) lives in scripts/bench_scaling.py
→ BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# ---------------------------------------------------------------------------
# No-Spark kernel-ceiling probe (noise normalization). The dominant scoring
# kernel (batch numpy Jaro) through raw multiprocessing — no Spark, no Arrow,
# no JVM — on the SAME host window as the bench. Every BENCH_r*.json carries
# the probe so cross-round throughput deltas can be attributed: if the probe
# moves with the suite, the host moved, not the code (the r3 bench window
# measured a −32% suite swing in lockstep with this probe).
# ---------------------------------------------------------------------------

_PROBE_TASKS = 256          # tasks × 8 reps × 2048 pairs = 4.2M kernel pairs
_PROBE_JOB = r'''
import json, sys, time, random
sys.path.insert(0, sys.argv[1])
from multiprocessing import Pool

def init():
    # EVERY worker imports the kernel at pool creation — a plain warm map
    # leaves half the pool cold, and after the suite has churned the page
    # cache those workers pay a multi-second numpy import INSIDE the timed
    # window (observed 1s -> 13s probe with 54% idle CPU).
    import automatedreclin_spark.functions.strings  # noqa: F401

def work(seed):
    from automatedreclin_spark.functions.strings import jaro_similarity_batch
    rnd = random.Random(seed)
    xs = ['Customer#%09d' % rnd.randint(0, 150000) for _ in range(2048)]
    ys = [n[:5] + 'x' + n[6:] if i % 3 else n for i, n in enumerate(xs)]
    for _ in range(8):
        jaro_similarity_batch(xs, ys)
    return 0

if __name__ == "__main__":
    nproc, ntasks = int(sys.argv[2]), int(sys.argv[3])
    with Pool(nproc, initializer=init) as p:
        p.map(work, range(2 * nproc))     # warm allocators everywhere
        t0 = time.time()
        p.map(work, range(ntasks), chunksize=4)
        print(json.dumps({"sec": time.time() - t0}))
'''


def _cpu_jiffies() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _kernel_probe_once(cpus: int) -> dict:
    try:
        load1 = round(os.getloadavg()[0], 1)
        j0 = _cpu_jiffies()
        res = subprocess.run(
            [sys.executable, "-c", _PROBE_JOB, str(REPO), str(cpus),
             str(_PROBE_TASKS)],
            capture_output=True, text=True, timeout=600,
        )
        j1 = _cpu_jiffies()
        d = [b - a for a, b in zip(j0, j1)]
        tot = sum(d) or 1
        sec = json.loads(
            [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
        )["sec"]
        pairs = _PROBE_TASKS * 8 * 2048
        return {"sec": round(sec, 3), "pairs_per_sec": round(pairs / sec, 1),
                "steal_pct": round(100 * d[7] / tot, 1),
                "idle_pct": round(100 * d[3] / tot, 1),
                "load1_pre": load1}
    except Exception as e:  # probe must never fail the bench
        return {"error": f"{type(e).__name__}: {e}"}


def kernel_probe(cpus: int, samples: int = 2) -> dict:
    """Measure the no-Spark kernel throughput (pairs/sec) in a subprocess,
    plus the hypervisor STEAL fraction over the probe window — this box is a
    VM with intermittent co-tenant bursts (observed 0–9% steal swinging the
    probe 4.1M → 3.2M pairs/s within seconds), so steal% is the definitive
    external-contention signal for cross-round comparisons.

    BEST-OF-``samples``: a single ~0.6 s probe has ±20% one-sided noise when
    a heap-grown Spark JVM is resident (measured idle-box spread ±6%, JVM-
    resident spread 5.1–6.9M across consecutive runs) — transient dips, never
    transient spikes. A capability probe estimates the host's attainable
    ceiling, and max-of-k is the right estimator under one-sided
    contamination: it filters the dips that made in-band windows fail the
    25% band check, while a PERSISTENTLY degraded host (the r3/r4 pattern,
    every sample ~2.8M for minutes) still reads degraded on every sample.
    All samples' values are kept in ``samples_pps`` for transparency; steal%
    is reported as the max across samples (the cautious reading)."""
    runs = [_kernel_probe_once(cpus) for _ in range(max(1, samples))]
    ok = [r for r in runs if "pairs_per_sec" in r]
    if not ok:
        return runs[-1]
    best = max(ok, key=lambda r: r["pairs_per_sec"])
    return {**best,
            "steal_pct": max(r["steal_pct"] for r in ok),
            "samples_pps": [r["pairs_per_sec"] for r in ok]}

from automatedreclin_spark.session import get_spark  # noqa: E402
from automatedreclin_spark.entry_queries import QUERIES  # noqa: E402

BENCH_QUERIES = [
    "cv_binary",            # J4 block join + binary gammas (Catalyst)
    "cv_levenshtein",       # native levenshtein gamma
    "cv_jaro",              # Arrow pandas-UDF gamma
    "score_ratio_fixed_params",  # A5/A6/A9 density-ratio scoring (Catalyst)
    "mec_binary_customer",  # full iterative MEC fit + 1:1 selection
    "blocked_mec_customer", # inverted blocked MEC (the scale path)
    "blocked_mec_alpha",    # T6 alpha U-drop (sketch retention) per round
    "mec_flr_customer",     # distributed flr bisection per round
    "dedup_exact",
    "text_token_stats",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",    # signature -> banding -> verify
    "simhash_dedup",
    "ann_cosine_topk",
]

#: queries whose output rows == scored candidate pairs (throughput basis)
SCORING_QUERIES = ["cv_binary", "cv_levenshtein", "cv_jaro",
                   "score_ratio_fixed_params"]


def force(df) -> int:
    """Force full evaluation of every column; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return df.count()


#: probe-gate: a bench window is CLEAN iff both bracketing probes clear the
#: floor AND agree within the band below. The floor is SELF-CALIBRATING —
#: ``PROBE_SELF_FRAC × best probe seen in this invocation`` — not an absolute
#: pairs/sec: the sandbox VM migrates hosts between rounds (the r5 reboot
#: moved the probe plateau 4.1–4.4M → ~1.7M pairs/sec while Spark suite
#: throughput was UNCHANGED — the new host is slower only on the
#: bandwidth-saturating pure-kernel path), so an absolute floor calibrated on
#: one host mismarks every window on the next. ``PROBE_FLOOR`` remains as an
#: absolute env-overridable sanity bound (default 0.8M ≈ unusable host).
PROBE_FLOOR = float(os.environ.get("SPARK_GRAFT_PROBE_FLOOR", "800000"))
#: window floor as a fraction of the invocation's best probe: the r4-style
#: ~1.9× degradation ratios 0.54, ordinary co-tenant steal swings ratio ~0.73
#: (4.4M → 3.2M within seconds) — 0.6 separates them.
PROBE_SELF_FRAC = float(os.environ.get("SPARK_GRAFT_PROBE_SELF_FRAC", "0.6"))
#: max relative disagreement |before−after| / max(before, after) for a clean
#: window (the r4 degraded window disagreed by ~46%).
PROBE_BAND = float(os.environ.get("SPARK_GRAFT_PROBE_BAND", "0.25"))
#: full-suite attempts before accepting a degraded window (annotated).
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))


def _window_clean(before: dict, after: dict,
                  best_seen: float = 0.0) -> tuple[bool, str | None]:
    """Judge the suite's host window from its bracketing probes.

    ``best_seen``: highest probe pairs/sec observed anywhere in this bench
    invocation (including this window's own probes) — the self-calibration
    reference. A host that is uniformly slow for the whole invocation is
    indistinguishable from a slower host and passes; a window slower than
    ``PROBE_SELF_FRAC`` of what THIS invocation has shown the host can do is
    degraded. Mid-window collapses are caught by the band check regardless."""
    vals = [p.get("pairs_per_sec") for p in (before, after)]
    if any(v is None for v in vals):
        return True, "probe_unavailable"  # can't gate on a missing signal
    lo, hi = min(vals), max(vals)
    floor = max(PROBE_FLOOR, PROBE_SELF_FRAC * max(best_seen, hi))
    if lo < floor:
        return False, f"probe {lo:,.0f} below floor {floor:,.0f}"
    if (hi - lo) / hi > PROBE_BAND:
        return False, f"probes disagree {100 * (hi - lo) / hi:.0f}% (> {100 * PROBE_BAND:.0f}%)"
    return True, None


def _run_suite(spark, sf_dir: str, queries: list[str], repeats: int) -> dict:
    timings: dict[str, float] = {}
    scoring_pairs = 0
    scoring_secs = 0.0
    for name in queries:
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.time()
            n = force(QUERIES[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if name in SCORING_QUERIES:
            scoring_pairs += n
            scoring_secs += best
    return {"timings": timings, "scoring_pairs": scoring_pairs,
            "scoring_secs": scoring_secs,
            "value": round(scoring_pairs / scoring_secs, 1) if scoring_secs else 0.0}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", cpus=cpus)

    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    queries = only.split(",") if only else BENCH_QUERIES
    # Best-of-3 by default: the first evaluation pays whole-stage-codegen
    # compilation and Python-worker spin-up, which a long-running job never
    # re-pays — report steady-state throughput. Measured on this host, the
    # second run still under-samples steady state under co-tenant steal
    # (cv_binary best-of-2 ≈ 1.5-2.7 s vs 0.72 s best-of-3-after-warm).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    # Probe-gated attempts: the official artifact must come from a window
    # whose bracketing no-Spark probes are in-band (the r4 headline landed in
    # a window its own probes showed ~1.9× degraded — never again). Retry the
    # whole suite up to MAX_ATTEMPTS; if no clean window appears, emit the
    # best attempt annotated degraded=true.
    attempts: list[dict] = []
    best_probe_seen = 0.0
    for attempt_no in range(1, MAX_ATTEMPTS + 1):
        probe_before = kernel_probe(cpus)
        suite = _run_suite(spark, sf_dir, queries, repeats)
        probe_after = kernel_probe(cpus)
        best_probe_seen = max(
            [best_probe_seen]
            + [p.get("pairs_per_sec") or 0.0
               for p in (probe_before, probe_after)])
        clean, reason = _window_clean(probe_before, probe_after,
                                      best_probe_seen)
        attempts.append({**suite, "probe_before": probe_before,
                         "probe_after": probe_after, "clean": clean,
                         "degraded_reason": reason})
        if clean:
            break
        print(f"# bench attempt {attempt_no} degraded ({reason}); "
              f"{'retrying' if attempt_no < MAX_ATTEMPTS else 'giving up'}",
              file=sys.stderr)

    clean_attempts = [a for a in attempts if a["clean"]]
    chosen = max(clean_attempts or attempts, key=lambda a: a["value"])
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "candidate-pair scoring throughput",
        "value": chosen["value"],
        "unit": "pairs/sec",
        "queries": chosen["timings"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "scoring_pairs": chosen["scoring_pairs"],
        # the FIXED query subset the headline is computed from — adding fit
        # queries to BENCH_QUERIES can never dilute round-over-round
        # throughput comparability
        "scoring_queries": SCORING_QUERIES,
        "total_sec": round(sum(chosen["timings"].values()), 3),
        # host-noise normalization: no-Spark kernel throughput bracketing the
        # chosen suite attempt (see kernel_probe) — compare across
        # BENCH_r*.json before attributing a suite delta to code
        "kernel_probe_before": chosen["probe_before"],
        "kernel_probe_after": chosen["probe_after"],
        # probe gate verdict for THIS artifact
        "degraded": not chosen["clean"],
        "degraded_reason": chosen["degraded_reason"],
        "attempts": len(attempts),
        "probe_floor": PROBE_FLOOR,
        "probe_self_frac": PROBE_SELF_FRAC,
        "probe_best_seen": best_probe_seen,
        "probe_band": PROBE_BAND,
        # per-attempt summary (headline + probe values) for the record
        "attempt_log": [
            {"value": a["value"], "clean": a["clean"],
             "probe_before": a["probe_before"].get("pairs_per_sec"),
             "probe_after": a["probe_after"].get("pairs_per_sec"),
             "steal_before": a["probe_before"].get("steal_pct"),
             "steal_after": a["probe_after"].get("steal_pct")}
            for a in attempts
        ],
    }))


if __name__ == "__main__":
    main()
