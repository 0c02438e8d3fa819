"""Scale anchor for the select_mec_pairs budget truncation (VERDICT r3 #1):
top-n_target of a synthetic survivor set big enough that n_target exceeds
TOPK_VIA_SORT_MAX, so the sketch-based ``retain_top_n`` routing is the path
under test — at a size where the old ``orderBy().limit()`` driver merge is
measurably the wrong plan.

Validates (a) exact set equality between the two strategies (order-insensitive
xxhash checksum + count), (b) wall time of each, (c) the plan gate (no
TakeOrderedAndProject / GlobalLimit / Window / single-partition exchange in
the retain path). Usage:

    python scripts/bench_truncation.py [n_rows] [n_keep]

Defaults: 50M rows, 5M kept. Appends a "## Budget-truncation anchor" section
to BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from automatedreclin_spark.session import get_spark  # noqa: E402
import automatedreclin_spark.operators.selection as sel  # noqa: E402


def checksum(df) -> tuple[int, int]:
    """Order-insensitive (count, sum of row hashes) over the selected keys."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("a", "b")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_keep = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark(app_name="bench-truncation", cpus=32)

    # Survivor-set shape: unique (a, b), disjoint blocks, continuous ratio
    # with a heavy tie mass at one value (the worst case for the boundary
    # resolution) — deterministic, no RNG.
    base = spark.range(n_rows).select(
        F.col("id").alias("a"),
        (F.col("id") + n_rows).alias("b"),
        (F.col("id") % 1000).alias("block"),
        F.when(F.col("id") % 17 == 0, F.lit(0.5))  # ~6% tied at 0.5
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(2 ** 40)) / F.lit(2.0 ** 40))
         .alias("ratio"),
    ).repartition(64).persist()
    base.count()

    results: dict = {"n_rows": n_rows, "n_keep": n_keep}

    # sketch path (the production routing for n_keep > TOPK_VIA_SORT_MAX)
    assert n_keep > sel.TOPK_VIA_SORT_MAX, "anchor must exceed the crossover"
    t0 = time.time()
    kept_sketch = sel._truncate_to_budget(base, n_keep, False, False).persist()
    cs_sketch = checksum(kept_sketch)
    results["sketch_sec"] = round(time.time() - t0, 2)
    plan = kept_sketch._jdf.queryExecution().executedPlan().toString()
    for banned in ("TakeOrderedAndProject", "GlobalLimit", "Window",
                   "Exchange SinglePartition"):
        assert banned not in plan, banned
    results["sketch_plan_clean"] = True

    # driver-merge path (what the code would have done before the routing)
    t0 = time.time()
    key = sel._never_sort_key(False, False)
    kept_sort = base.orderBy(key.desc(), "a", "b").limit(n_keep).persist()
    cs_sort = checksum(kept_sort)
    results["sort_limit_sec"] = round(time.time() - t0, 2)

    results["sets_equal"] = cs_sketch == cs_sort
    assert results["sets_equal"], (cs_sketch, cs_sort)
    # checksum-sum is order-insensitive but collision-prone in principle —
    # establish true set equality with an empty symmetric difference
    # (exceptAll both ways), which no hash collision can fake.
    sym_diff = (kept_sketch.exceptAll(kept_sort).limit(1).count()
                + kept_sort.exceptAll(kept_sketch).limit(1).count())
    results["symmetric_difference_empty"] = sym_diff == 0
    assert sym_diff == 0, "selected sets differ despite equal checksums"
    print(json.dumps(results))

    bench_md = REPO / "BENCH.md"
    lines = bench_md.read_text().splitlines()
    # replace ONLY our own section (up to the next "## " header), never the
    # file tail — other anchors may have been appended after a previous run
    for i, ln in enumerate(lines):
        if ln.startswith("## Budget-truncation anchor"):
            end = next((j for j in range(i + 1, len(lines))
                        if lines[j].startswith("## ")), len(lines))
            lines = lines[:i] + lines[end:]
            break
    lines += [
        "## Budget-truncation anchor (select_mec_pairs past the crossover)",
        "",
        f"- survivor set: {n_rows:,} rows (disjoint blocks, continuous ratio",
        "  with a ~6% tie mass at one value), budget n_target ="
        f" {n_keep:,} > TOPK_VIA_SORT_MAX ({sel.TOPK_VIA_SORT_MAX:,})",
        f"- sketch routing (`retain_top_n`): **{results['sketch_sec']:.1f} s**,"
        " executed plan free of TakeOrderedAndProject / GlobalLimit / Window /",
        "  single-partition exchanges",
        f"- legacy `orderBy().limit()` on the same input: "
        f"{results['sort_limit_sec']:.1f} s (driver-merged top-k — works here,"
        " OOMs the driver when n_target reaches billions)",
        "- selected sets identical: empty exceptAll symmetric difference"
        " both ways (plus matching count + order-insensitive checksum)",
        "",
        "Generated by `python scripts/bench_truncation.py`.",
        "",
    ]
    bench_md.write_text("\n".join(lines) + "\n")
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()
