"""Section-wall profile of q_mec_flr_customer at sf0.1 (guide §1: measure
first). Times the fit itself vs each of the query's validation passes over
the scored frame, so the r6 doc's 'where does 24 s go' claim is measured,
not inferred.

Usage: python scripts/profile_flr_query.py [sf_dir]
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
from automatedreclin_spark.entry_queries import _record_sets  # noqa: E402
from automatedreclin_spark.functions.comparators import (  # noqa: E402
    cmp_identical,
    levenshtein_norm,
)
from automatedreclin_spark.models.mec import mec  # noqa: E402
from automatedreclin_spark.operators.pairs import block_pairs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-flr", cpus=32)
    walls: dict[str, float] = {}

    t0 = time.time()
    A, B = _record_sets(spark, sf_dir)
    res = mec(
        A, B, variables=["name", "seg"],
        comparators={"name": levenshtein_norm(), "seg": cmp_identical()},
        methods={"name": "continuous_parametric", "seg": "binary"},
        pairs=block_pairs(A, B, dedup=False).select("block", "a", "b"),
        block_col="block",
        set_construction="flr", target_rate=0.05, tol=0.01,
        max_iter_bisection=100,
        exact_collect_max=0,
    )
    walls["fit"] = time.time() - t0

    sel = res.M_est.select("a", "b", "ratio")
    scored = res.scored

    t0 = time.time()
    n_sel = sel.count()
    walls["sel_count"] = time.time() - t0

    t0 = time.time()
    row = scored.join(sel.select("a", "b"), ["a", "b"], "left_semi").agg(
        F.min("ratio"), F.sum("g_est"), F.count(F.lit(1))).collect()[0]
    walls["semi_agg"] = time.time() - t0

    t0 = time.time()
    scored.join(sel.select("a", "b"), ["a", "b"], "left_anti").agg(
        F.max(F.when(~F.isnan("ratio"), F.col("ratio")))).collect()
    walls["anti_max"] = time.time() - t0

    t0 = time.time()
    sel.join(scored.select("a", "b"), ["a", "b"], "left_anti").count()
    walls["subset_violations"] = time.time() - t0

    t0 = time.time()
    scored.select(F.round("gamma_name", 6).alias("g")).distinct().count()
    walls["distinct_gamma"] = time.time() - t0

    walls = {k: round(v, 2) for k, v in walls.items()}
    print(json.dumps({"n_sel": n_sel, "walls": walls,
                      "total": round(sum(walls.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
