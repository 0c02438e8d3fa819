"""Heavier perf anchor (~sf1-equivalent scoring volume) for round-over-round
comparison: the driver only ships sf ≤ 0.1 testdata, so this synthesizes a
10×-replicated customer table (key-offset copies — deterministic, no RNG)
under /tmp and runs the flagship scoring + fit stages on it.

  customer sf0.1 = 15k rows → heavy = 150k rows (sf1-equivalent)
  block pairs (25 nations): ~4M pairs at sf0.1 → ~400M at heavy

The full MEC fit at 400M pairs is intentionally included: per-iteration work
is two aggregations + a per-block selection over the persisted gamma base, so
it must stay minutes-not-hours. Usage:

    python scripts/bench_heavy.py [replication] [sf_dir] [alpha]

With a nonzero third argument, ALSO runs a blocked_mec fit with that alpha
at the heavy size — exercising the sketch-based U-retention path (T6) at
hundreds of millions of nonmatch rows, where the old global row_number
window would have serialized everything through one task.

Appends a "## Heavy anchor" section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Local mode: the driver heap IS the whole cluster's memory. The 400M-pair
# gamma base caches at ~15-18 GB; at 12g it half-spilled and execution
# memory churned against it, and one degraded-window run OOM'd the
# DAGScheduler at the 8g default. 28g keeps the cache memory-resident with
# execution headroom (host has 128 GB; a real cluster provisions this
# per-executor). Callers can still pin their own size.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import functions as F  # noqa: E402

from bench import kernel_probe  # noqa: E402  (no-Spark host-noise probe)
from automatedreclin_spark.session import get_spark  # noqa: E402
from automatedreclin_spark.entry_queries import _record_sets  # noqa: E402
from automatedreclin_spark.models.mec import mec  # noqa: E402
from automatedreclin_spark.operators.comparison import comparison_vectors  # noqa: E402
from automatedreclin_spark.operators.pairs import block_pairs  # noqa: E402
from automatedreclin_spark.functions.comparators import (  # noqa: E402
    cmp_identical,
    jarowinkler_complement,
)


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    alpha = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    heavy_dir = f"/tmp/heavy_customer_x{repl}"

    spark = get_spark(app_name="bench-heavy", cpus=32)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    if not Path(heavy_dir, "_SUCCESS").exists():
        base = cust
        out = base
        for r in range(1, repl):
            out = out.unionByName(
                base.withColumn("c_custkey", F.col("c_custkey") + r * 10_000_000)
            )
        out.repartition(64).write.mode("overwrite").parquet(heavy_dir)

    # _record_sets reads {sf_dir}/customer.parquet — give it a dir view
    view_dir = Path("/tmp/heavy_sf_view")
    view_dir.mkdir(exist_ok=True)
    link = view_dir / "customer.parquet"
    if not link.exists():
        link.symlink_to(heavy_dir)

    A, B = _record_sets(spark, str(view_dir))

    # SPARK_GRAFT_HEAVY_STAGES=alpha → skip the scoring + plain-fit stages
    # and the BENCH.md rewrite (targeted alpha re-measure; JSON only).
    alpha_only = os.environ.get("SPARK_GRAFT_HEAVY_STAGES", "all") == "alpha"

    results: dict = {}
    # Host-noise attribution: bracket EVERY stage with the no-Spark kernel
    # probe (bench.py) so a slow wall can be pinned to the host or the code.
    results["probe_pre_scoring"] = kernel_probe(32)

    pairs = block_pairs(A, B, dedup=False)
    if not alpha_only:
        # 1) scoring throughput: binary + jaro gammas over block pairs
        cv = comparison_vectors(
            A, B, ["name", "seg"],
            comparators={"name": jarowinkler_complement(), "seg": cmp_identical()},
            pairs=pairs, check_finite=False,
        )
        cv.omega.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        cv.omega.write.format("noop").mode("overwrite").save()
        score_sec = time.time() - t0
        n_pairs = cv.n
        results["scoring_pairs"] = n_pairs
        results["scoring_sec"] = round(score_sec, 2)
        results["pairs_per_sec"] = round(n_pairs / score_sec, 1)
        results["probe_pre_fit"] = kernel_probe(32)
        # partial-results line after every stage: a mid-run crash (e.g. the r5
        # heartbeat-expiry context teardown) must not lose completed numbers
        print("PARTIAL " + json.dumps(results), flush=True)

        # 2) full MEC fit (block-constrained pairs) wall at the heavy size
        t0 = time.time()
        res = mec(A, B, variables=["name", "seg"],
                  pairs=pairs.select("block", "a", "b"), block_col="block")
        fit_sec = time.time() - t0
        results["mec_fit_sec"] = round(fit_sec, 2)
        results["mec_n_iter"] = res.n_iter
        results["mec_m_est"] = res.M_est.count()
        # stage attribution: where the fit wall actually goes
        results["mec_stage_seconds"] = res.stage_seconds
        results["mec_iter_seconds"] = [round(x, 2) for x in res.iter_seconds]
        results["mec_iter_substage_seconds"] = res.iter_substage_seconds
        results["probe_post_fit"] = kernel_probe(32)
        print("PARTIAL " + json.dumps(results), flush=True)

    # 3) optional: blocked inverted MEC with alpha U-drop at the heavy size —
    # the T6 sketch-retention scale path under a real 10^8-row U.
    alpha_lines: list[str] = []
    if alpha > 0:
        from automatedreclin_spark.models.blocked_mec import blocked_mec

        # Stage isolation: mec() returns with its ~15-18 GB gamma base still
        # persisted (res.scored is a lazy projection over it). Left pinned,
        # it competes with the alpha fit's own equally-sized cache for the
        # unified memory region and every lazy-U pass churns through
        # eviction/re-spill — measured 4885 s (r5, clean probes) vs 2307 s
        # (r4) before this release. Each stage measures its own cache.
        spark.catalog.clearCache()

        t0 = time.time()
        bres = blocked_mec(A, B, ["name", "seg"],
                           pairs=pairs.select("block", "a", "b"), alpha=alpha)
        alpha_sec = time.time() - t0
        diag = bres.u_fit_diagnostics
        applied = list(diag[diag["alpha_applied"]]["n_U_fit"]) if len(diag) else []
        results["alpha"] = alpha
        results["alpha_fit_sec"] = round(alpha_sec, 2)
        results["alpha_n_iter"] = bres.iter
        results["alpha_m_est"] = int(bres.n_M_est)
        results["alpha_applied_iters"] = len(applied)
        results["alpha_stage_seconds"] = bres.stage_seconds
        results["alpha_iter_seconds"] = bres.iter_seconds
        results["alpha_iter_substage_seconds"] = bres.iter_substage_seconds
        results["probe_post_alpha"] = kernel_probe(32)
        alpha_lines = [
            f"- blocked inverted MEC with `alpha={alpha}` U-drop "
            f"({bres.iter} iterations, sketch retention applied in "
            f"{len(applied)} of them): **{alpha_sec:.1f} s**, "
            f"|M_est| = {int(bres.n_M_est):,} — the retention ranks "
            f"~{max(applied) if applied else 0:,} kept U rows per iteration "
            f"via an exact value-histogram prefix cut (r6 fast path; "
            f"rank-bracket fallback above the distinct-count gate — no "
            f"single-partition window, no approxQuantile digest)",
        ]

    print(json.dumps(results))
    if alpha_only:
        return

    bench_md = REPO / "BENCH.md"
    lines = bench_md.read_text().splitlines()
    # drop a previous heavy section if present (header carries a suffix —
    # match by prefix, not exact line, or reruns append duplicates)
    for i, ln in enumerate(lines):
        if ln.startswith("## Heavy anchor"):
            lines = lines[:i]
            break
    lines += [
        "## Heavy anchor (sf1-equivalent, 10× key-offset customer replication)",
        "",
        f"- record sets: |A| = {A.count():,}, |B| = {B.count():,} "
        f"(customer ×{repl} replication of {sf_dir})",
        f"- scored candidate pairs (25 blocks, jaro + binary): **{n_pairs:,}**",
        f"- scoring wall: {score_sec:.1f} s @ local[32] → **{n_pairs / score_sec:,.0f} pairs/sec**",
        f"- full MEC fit on block-constrained pairs (iterate-to-convergence, "
        f"{res.n_iter} iterations): "
        f"**{fit_sec:.1f} s**, |M_est| = {results['mec_m_est']:,}",
        *alpha_lines,
        "",
        "Generated by `python scripts/bench_heavy.py`.",
        "",
    ]
    bench_md.write_text("\n".join(lines))
    print(f"updated {bench_md}")


if __name__ == "__main__":
    main()
