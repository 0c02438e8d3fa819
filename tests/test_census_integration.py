"""F5 census/CIS-shaped blocked integration (the vignette's scale shape,
mec-blocking.Rmd:78-113) + duplicates_in_A mode."""

import pytest
from pyspark.sql import functions as F

from automatedreclin_spark.fixtures import name_examples, synth_census_cis
from automatedreclin_spark.functions.comparators import jarowinkler_complement
from automatedreclin_spark.models.blocked_mec import blocked_mec
from automatedreclin_spark.models.mec import mec
from automatedreclin_spark.evaluation import pairwise_f1


def test_census_cis_blocked_linkage(spark):
    census, cis, truth = synth_census_cis(spark, n_a=1200, n_b=1100, seed=9)
    # block on the enumeration area (the vignette blocks on address fields)
    A = census.withColumn("block", F.col("enumcap").cast("long"))
    B = cis.withColumn("block", F.col("enumcap").cast("long"))
    res = blocked_mec(
        A, B,
        variables=["pername1", "pername2", "sex", "dob_day", "dob_mon", "dob_year"],
        comparators={"pername1": jarowinkler_complement(),
                     "pername2": jarowinkler_complement()},
        methods={"pername1": "continuous_parametric",
                 "pername2": "continuous_parametric"},
        true_matches=truth,
    )
    # blocking preserves all true matches (same enumcap by construction)
    assert res.blocking_eval["blocking_recall"] == 1.0
    m = res.M_est.select("a", "b")
    tp = m.join(truth, ["a", "b"], "inner").count()
    f1 = pairwise_f1(tp, m.count() - tp, truth.count() - tp)
    assert f1 >= 0.95, f"blocked census linkage F1 {f1}"
    # one-to-one + contract
    pdf = m.toPandas()
    assert pdf["a"].is_unique and pdf["b"].is_unique


def test_duplicates_in_A_mode(spark):
    """duplicates_in_A=True constrains only the A side of the greedy sweep
    (reference unsupervised_learning.R:215, internals.R:529-537): a B record
    may be matched by several A records, but each A record at most once."""
    import pandas as pd
    A = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2, 3],
        "name": ["x", "y", "z"], "city": ["c1", "c2", "c3"],
    }))
    B = spark.createDataFrame(pd.DataFrame({
        "b": [1, 2, 3, 4],
        "name": ["x", "x", "y", "q"], "city": ["c1", "c1", "c2", "c9"],
    }))
    res = mec(A, B, variables=["name", "city"], duplicates_in_A=True)
    m = res.M_est.toPandas()
    assert m["a"].is_unique  # a-side one-to-one still enforced


def test_summaries_render(spark):
    """methods.R print-surface analogue: summaries render without touching
    more than a bounded preview."""
    from automatedreclin_spark.summaries import summarize_mec

    A, B, true = name_examples(spark)
    res = mec(A, B, variables=["name", "surname"], true_matches=true)
    s = summarize_mec(res)
    assert "estimated matches" in s and "720" in s
    assert "Evaluation metrics" in s
