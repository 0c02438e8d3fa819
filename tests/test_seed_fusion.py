"""Fused seed-count parity: the raw-equality ``_seed`` column that replaces
the exact_match_pairs semi join (mec.py init agg, unsupervised_learning.R:
313-317) must flag EXACTLY the pairs the equi-join finds — for every
comparator (it bypasses the lossy gammas entirely), for NULL values (never
agree, like the join), for empty strings (agree, even though the DuckDB-
convention Jaro gamma scores ("", "") as disagreement 1.0), and for dropped
constant variables (seeds are defined on ALL original variables)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from automatedreclin_spark.fixtures import name_examples
from automatedreclin_spark.functions.comparators import (
    jarowinkler_complement,
    token_jaccard,
)
from automatedreclin_spark.models.mec import mec
from automatedreclin_spark.operators.comparison import comparison_vectors
from automatedreclin_spark.operators.pairs import exact_match_pairs


def _seed_pairs_via_join(A, B, variables, omega):
    seeds = exact_match_pairs(A, B, variables)
    return set(map(tuple, seeds.join(
        omega.select("a", "b"), ["a", "b"], "left_semi"
    ).select("a", "b").toPandas().itertuples(index=False)))


def _seed_pairs_via_flag(omega):
    return set(map(tuple, omega.filter("_seed").select("a", "b")
                   .toPandas().itertuples(index=False)))


def test_seed_flag_matches_join_on_fuzzy_fixture(spark):
    A, B, _ = name_examples(spark)
    variables = ["name", "surname"]
    cv = comparison_vectors(
        A, B, variables, comparators={"name": jarowinkler_complement()},
        check_finite=False, seed_flag_variables=variables,
    )
    flagged = _seed_pairs_via_flag(cv.omega)
    joined = _seed_pairs_via_join(A, B, variables, cv.omega)
    assert flagged == joined and flagged


def test_seed_flag_empty_strings_and_nulls(spark):
    """("", "") IS a seed (the join matches empty strings) even though the
    DuckDB-convention Jaro gamma is 1.0 there; NULL never agrees, exactly
    like the equi-join."""
    A = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3], "name": ["", "x", None]}))
    B = spark.createDataFrame(
        pd.DataFrame({"b": [1, 2, 3], "name": ["", "x", None]}))
    cv = comparison_vectors(
        A, B, ["name"], comparators={"name": jarowinkler_complement()},
        check_finite=False, seed_flag_variables=["name"],
    )
    flagged = _seed_pairs_via_flag(cv.omega)
    joined = _seed_pairs_via_join(A, B, ["name"], cv.omega)
    assert flagged == joined == {(1, 1), (2, 2)}
    # and the gamma really is lossy at ("", "") — the very reason the flag
    # goes through the raw values
    g = cv.omega.filter("a = 1 and b = 1").select("gamma_name").collect()[0][0]
    assert g == 1.0


def test_seed_flag_token_jaccard_reordered_tokens(spark):
    """token_jaccard scores reordered tokens as perfect agreement (gamma 0)
    but they are NOT equal values — the flag must not call them seeds."""
    A = spark.createDataFrame(pd.DataFrame({"a": [1], "name": ["ab ba"]}))
    B = spark.createDataFrame(pd.DataFrame({"b": [1], "name": ["ba ab"]}))
    cv = comparison_vectors(
        A, B, ["name"], comparators={"name": token_jaccard()},
        check_finite=False, seed_flag_variables=["name"],
    )
    row = cv.omega.collect()[0]
    assert row["gamma_name"] == 0.0          # comparator calls it perfect
    assert not row["_seed"]                  # but it is not a seed


def test_seed_flag_covers_dropped_constant_variable(spark):
    """Seeds are defined on ALL original variables. A constant variable with
    NULL holes is dropped from the gammas (count_distinct ignores NULL) yet
    still constrains the seed join — the flag must replicate that."""
    A = spark.createDataFrame(pd.DataFrame(
        {"a": [1, 2], "name": ["x", "y"], "const": ["k", None]}))
    B = spark.createDataFrame(pd.DataFrame(
        {"b": [1, 2], "name": ["x", "y"], "const": ["k", None]}))
    variables = ["name", "const"]
    cv = comparison_vectors(
        A, B, ["name"], check_finite=False, seed_flag_variables=variables,
    )
    flagged = _seed_pairs_via_flag(cv.omega)
    joined = _seed_pairs_via_join(A, B, variables, cv.omega)
    # (2,2) agrees on name but has NULL const → not a seed in either path
    assert flagged == joined == {(1, 1)}


def test_mec_goldens_unchanged_with_fused_seeds(spark):
    """End-to-end: the fused seed count drives the same fit as before
    (binary golden from test_mec.R — match set, thetas, confusion)."""
    A, B, true = name_examples(spark)
    res = mec(A, B, variables=["name", "surname"], true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3, 4]
    assert list(m["b"]) == [1, 2, 3, 4]
    assert res.confusion == [[4, 4], [0, 112]]
    assert res.stage_seconds["seeds"] == 0.0  # fused — no separate job
