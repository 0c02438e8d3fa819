"""Round-6 profiling: run one fit query's underlying model directly and
print the stage/iteration wall splits the result object records.

Usage: python scripts/profile_fit.py {alpha|flr|binary|blocked|supervised} [sf_dir]
"""

from __future__ import annotations

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


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "alpha"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"profile-{which}")
    A, B = _record_sets(spark, sf_dir)
    t0 = time.time()
    if which == "alpha":
        from automatedreclin_spark.models.blocked_mec import blocked_mec

        res = blocked_mec(
            A, B, variables=["name", "seg"],
            comparators={"name": levenshtein_norm(), "seg": cmp_identical()},
            methods={"name": "continuous_parametric", "seg": "binary"},
            alpha=0.25,
        )
        res.M_est.write.format("noop").mode("overwrite").save()
        print(f"fit+M_est wall: {time.time() - t0:.2f}s iters={res.iter}")
        print("stage_seconds:", res.stage_seconds)
        print("iter_seconds:", res.iter_seconds)
        print("iter_substage_seconds:", res.iter_substage_seconds)
    elif which == "blocked":
        from automatedreclin_spark.models.blocked_mec import blocked_mec

        res = blocked_mec(A, B, variables=["name", "seg"])
        res.M_est.write.format("noop").mode("overwrite").save()
        print(f"fit+M_est wall: {time.time() - t0:.2f}s iters={res.iter}")
        print("stage_seconds:", res.stage_seconds)
        print("iter_seconds:", res.iter_seconds)
        print("iter_substage_seconds:", res.iter_substage_seconds)
    elif which == "binary":
        from automatedreclin_spark.models.mec import mec
        from automatedreclin_spark.operators.pairs import block_pairs

        pairs = block_pairs(A, B, block_col="block", dedup=False)
        res = mec(A, B, variables=["name", "seg"],
                  pairs=pairs.select("block", "a", "b"), block_col="block")
        res.M_est.write.format("noop").mode("overwrite").save()
        print(f"fit+M_est wall: {time.time() - t0:.2f}s iters={res.n_iter}")
        print("stage_seconds:", res.stage_seconds)
        print("iter_seconds:", [round(x, 2) for x in res.iter_seconds])
        print("iter_substage_seconds:", res.iter_substage_seconds)
    elif which == "flr":
        from automatedreclin_spark.models.mec import mec
        from automatedreclin_spark.operators.pairs import block_pairs

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
        res.M_est.write.format("noop").mode("overwrite").save()
        print(f"fit+M_est wall: {time.time() - t0:.2f}s iters={res.n_iter} "
              f"bisect_iters={res.iter_bisection}")
        print("stage_seconds:", res.stage_seconds)
        print("iter_seconds:", [round(x, 2) for x in res.iter_seconds])
        print("iter_substage_seconds:", res.iter_substage_seconds)
    elif which == "supervised":
        from automatedreclin_spark.models.supervised import (
            predict_rec_lin,
            train_rec_lin,
        )
        from automatedreclin_spark.operators.pairs import block_pairs as _bp

        trainA = A.filter(F.col("a") % 7 != 0)
        trainB = B.filter(F.col("b") % 7 != 0)
        matches = (
            trainA.select("a").join(trainB.select("b"),
                                    F.col("a") == F.col("b"))
            .select("a", "b")
        )
        t = time.time()
        model = train_rec_lin(trainA, trainB, matches,
                              variables=["name", "seg"])
        print(f"train wall: {time.time() - t:.2f}s")
        t = time.time()
        holdA = A.filter(F.col("a") % 7 == 0)
        holdB = B.filter(F.col("b") % 7 == 0)
        hold_pairs = _bp(holdA, holdB, dedup=False).select("a", "b")
        pred = predict_rec_lin(model, holdA, holdB, pairs=hold_pairs)
        pred.M_est.write.format("noop").mode("overwrite").save()
        print(f"predict wall: {time.time() - t:.2f}s")
        print(f"total: {time.time() - t0:.2f}s")
    else:
        raise SystemExit(f"unknown target {which}")


if __name__ == "__main__":
    main()
