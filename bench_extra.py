"""Round-6 optimization measurement harness (bench.py itself is FROZEN).

Times any subset of registry queries in isolation with the same
methodology as bench.py (noop write + count, guide §1.4) and captures
.explain("formatted") of the returned DataFrame into plans/r06/.
(For the iterative-fit queries the returned frame is the driver-built
invariant table, so their plan files are trivial; their evidence is the
fit-internal stage walls instead.)

Usage:
    python bench_extra.py [sf_dir] [only_csv] [suffix]

- sf_dir   default /root/testdata/sf0.1
- only_csv comma-separated query names, or "-" for the bench set plus the
           slow oracle-only queries (dedup_clusters, supervised_predict*)
- suffix   plan-file suffix, default "before" -> plans/r06/<q>_before.txt

Env: SPARK_GRAFT_EXTRA_REPEATS (default 1; bench.py uses best-of-3),
     SPARK_GRAFT_EXTRA_PLANS=0 to skip plan capture.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from automatedreclin_spark.session import get_spark  # noqa: E402
from automatedreclin_spark.entry_queries import QUERIES  # noqa: E402

DEFAULT_QUERIES = [
    "cv_binary", "cv_levenshtein", "cv_jaro", "score_ratio_fixed_params",
    "mec_binary_customer", "blocked_mec_customer", "blocked_mec_alpha",
    "mec_flr_customer", "dedup_exact", "text_token_stats",
    "ngram_jaccard_pairs", "minhash_lsh_dedup", "simhash_dedup",
    "ann_cosine_topk",
    # slow oracle-only queries (not in bench.py but graded via CORRECTNESS)
    "dedup_clusters", "supervised_predict", "supervised_predict_ratio2",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = (sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] != "-"
            else DEFAULT_QUERIES)
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    repeats = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "1"))
    capture_plans = os.environ.get("SPARK_GRAFT_EXTRA_PLANS", "1") != "0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-extra", cpus=cpus)
    plans_dir = REPO / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, float] = {}
    for name in only:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best, rows, df = None, 0, None
        for _ in range(repeats):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            rows = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if capture_plans and df is not None:
            pf = plans_dir / f"{name}_{suffix}.txt"
            try:
                plan_str = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                pf.write_text(plan_str)
            except Exception as e:  # plan capture must never fail the bench
                pf.write_text(f"plan capture failed: {e}")
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s rows={rows}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "queries": out,
                      "total_sec": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
