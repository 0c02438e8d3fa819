"""Executor-boundary smoke + scaling point (VERDICT r5 #4).

All in-repo evidence so far runs `local[N]` — one JVM, no serialization
boundary. This script runs the bench scoring job and the blocked binary MEC
fit under `local-cluster[n,cores,mem]` — REAL executor JVMs with real
closure serialization, broadcast and shuffle service — at two sizes
(2x4 and 8x4 cores by default), and checks the match set is IDENTICAL to
the single-JVM local[8] result (checksum over sorted (a,b)).

Usage: python scripts/bench_local_cluster.py [sf_dir] [replication]

At sf0.1 the blocked scoring job is ~4M pairs and finishes in ~3 s — pure
fixed cost (executor launch, python worker pools, broadcast), useless as a
scaling point. `replication` (default 3) key-offset-replicates the customer
table first (same deterministic scheme as bench_heavy.py) so the 2x4 vs 8x4
comparison times real work (~36M pairs at x3).

Appends nothing; prints one JSON line per master plus a summary. Cited from
BENCH.md / OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# executors are separate JVMs: their python workers need the package on
# PYTHONPATH (equivalent to spark-submit --py-files on a real cluster)
os.environ["PYTHONPATH"] = (
    str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automatedreclin_spark.session import get_spark  # noqa: E402
from automatedreclin_spark.entry_queries import _record_sets  # noqa: E402
from automatedreclin_spark.models.blocked_mec import blocked_mec  # noqa: E402
from automatedreclin_spark.operators.comparison import comparison_vectors  # noqa: E402
from automatedreclin_spark.operators.pairs import block_pairs  # noqa: E402
from automatedreclin_spark.functions.comparators import (  # noqa: E402
    cmp_identical,
    jarowinkler_complement,
)

MASTERS = [
    ("local[8]", 8),                      # single-JVM reference
    ("local-cluster[2,4,4096]", 8),       # 2 executors x 4 cores
    ("local-cluster[8,4,4096]", 32),      # 8 executors x 4 cores
]


def run_one(master: str, sf_dir: str) -> dict:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(2)
    spark = get_spark(app_name=f"lc-smoke-{master}", master=master,
                      extra_conf={
                          "spark.executorEnv.PYTHONPATH": str(REPO),
                      })
    out: dict = {"master": master}
    try:
        A, B = _record_sets(spark, sf_dir)
        pairs = block_pairs(A, B, dedup=False)
        cv = comparison_vectors(
            A, B, ["name", "seg"],
            comparators={"name": jarowinkler_complement(),
                         "seg": cmp_identical()},
            pairs=pairs, check_finite=False,
        )
        cv.omega.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        cv.omega.write.format("noop").mode("overwrite").save()
        score_sec = time.time() - t0
        n_pairs = cv.n
        out["scoring_pairs"] = n_pairs
        out["scoring_sec"] = round(score_sec, 2)
        out["pairs_per_sec"] = round(n_pairs / score_sec, 1)

        t0 = time.time()
        res = blocked_mec(A, B, variables=["name", "seg"])
        m = sorted(map(tuple, res.M_est.select("a", "b").collect()))
        out["fit_sec"] = round(time.time() - t0, 2)
        out["n_m_est"] = res.n_M_est
        out["m_checksum"] = hashlib.sha256(
            json.dumps(m).encode()).hexdigest()[:16]
    finally:
        spark.stop()
        time.sleep(2)
    return out


def _replicated_view(sf_dir: str, repl: int) -> str:
    """Key-offset-replicate customer x repl into a dir _record_sets can read."""
    if repl <= 1:
        return sf_dir
    heavy_dir = Path(f"/tmp/lc_customer_x{repl}")
    view_dir = Path(f"/tmp/lc_sf_view_x{repl}")
    if not (heavy_dir / "_SUCCESS").exists():
        spark = get_spark(app_name="lc-replicate", cpus=8)
        base = spark.read.parquet(f"{sf_dir}/customer.parquet")
        out = base
        for r in range(1, repl):
            out = out.unionByName(
                base.withColumn("c_custkey", F.col("c_custkey") + r * 10_000_000)
            )
        out.repartition(32).write.mode("overwrite").parquet(str(heavy_dir))
        spark.stop()
        time.sleep(2)
    view_dir.mkdir(exist_ok=True)
    link = view_dir / "customer.parquet"
    if not link.exists():
        link.symlink_to(heavy_dir)
    return str(view_dir)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = _replicated_view(sf_dir, repl)
    results = []
    for master, _cores in MASTERS:
        r = run_one(master, sf_dir)
        results.append(r)
        print(json.dumps(r), flush=True)
    ref = results[0]
    ok = all(r["m_checksum"] == ref["m_checksum"]
             and r["n_m_est"] == ref["n_m_est"] for r in results)
    lc2 = next(r for r in results if r["master"].startswith("local-cluster[2"))
    lc8 = next(r for r in results if r["master"].startswith("local-cluster[8"))
    speedup = lc2["scoring_sec"] / lc8["scoring_sec"]
    print(json.dumps({
        "m_est_identical_across_masters": ok,
        "scoring_speedup_2x4_to_8x4": round(speedup, 2),
        "scaling_efficiency": round(speedup / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
