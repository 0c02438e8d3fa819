"""Comparison-vector goldens (reference inst/tinytest/test_comparison_vectors.R)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from automatedreclin_spark.functions.comparators import jarowinkler_complement
from automatedreclin_spark.operators.comparison import comparison_vectors
from automatedreclin_spark.operators.pairs import validate_pairs

DF_1 = pd.DataFrame({
    "a": range(1, 11),
    "name": ["James", "Emma", "William", "Olivia", "Thomas",
             "Sophie", "Harry", "Amelia", "George", "Isabella"],
    "surname": ["Smith", "Johnson", "Brown", "Taylor", "Wilson",
                "Davis", "Clark", "Harris", "Lewis", "Walker"],
})
DF_2 = pd.DataFrame({
    "b": range(1, 11),
    "name": ["James", "Ema", "Wimliam", "Olivia", "Charlotte",
             "Henry", "Lucy", "Edward", "Alice", "Jack"],
    "surname": ["Smith", "Johnson", "Bron", "Tailor", "Moore",
                "Evans", "Hall", "Wright", "Green", "King"],
})
MATCHES = pd.DataFrame({"a": [1, 2, 3, 4], "b": [1, 2, 3, 4]})


@pytest.fixture(scope="module")
def tables(spark):
    return (
        spark.createDataFrame(DF_1),
        spark.createDataFrame(DF_2),
        spark.createDataFrame(MATCHES),
    )


def test_default_binary_comparator_golden(tables, spark):
    A, B, matches = tables
    cv = comparison_vectors(A, B, ["name", "surname"], matches=matches)
    head = (
        cv.omega.filter(F.col("a") == 1)
        .orderBy("b")
        .limit(6)
        .toPandas()
    )
    assert list(head["gamma_name"]) == [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert list(head["gamma_surname"]) == [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert list(head["match"]) == [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert cv.n == 100
    # match_prop golden: 4/100 * 10 = 0.4 (test_supervised_learning.R:75-81)
    assert cv.match_prop == pytest.approx(0.4)


def test_jw_comparator_golden(tables, spark):
    A, B, matches = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    cv = comparison_vectors(A, B, ["name", "surname"], comparators=comp, matches=matches)
    head = cv.omega.filter(F.col("a") == 1).orderBy("b").limit(6).toPandas()
    expected_name = [0, 0.4777777777777778, 0.5523809523809524, 1,
                     0.5629629629629630, 1]
    expected_surname = [0, 0.5523809523809524, 1, 0.5444444444444445, 1, 1]
    assert list(head["gamma_name"]) == pytest.approx(expected_name, abs=1e-12)
    assert list(head["gamma_surname"]) == pytest.approx(expected_surname, abs=1e-12)


def test_nonfinite_gamma_guard(spark):
    A = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "name": ["x", None]}))
    B = spark.createDataFrame(pd.DataFrame({"b": [1], "name": ["x"]}))
    with pytest.raises(ValueError, match="missing or non-finite"):
        comparison_vectors(A, B, ["name"])


def test_missing_variable_raises(tables):
    A, B, _ = tables
    with pytest.raises(ValueError, match="Not all variables are present in A"):
        comparison_vectors(A, B, ["nope"])


def test_validate_pairs_errors(spark):
    dup = spark.createDataFrame(pd.DataFrame({"a": [1, 1], "b": [2, 2]}))
    with pytest.raises(ValueError, match="duplicate"):
        validate_pairs(dup, 10, 10)
    oob = spark.createDataFrame(pd.DataFrame({"a": [1, 99], "b": [2, 2]}))
    with pytest.raises(ValueError, match="outside"):
        validate_pairs(oob, 10, 10)
    neg = spark.createDataFrame(pd.DataFrame({"a": [0], "b": [2]}))
    with pytest.raises(ValueError, match="positive"):
        validate_pairs(neg, 10, 10)


def test_explicit_pairs_subset(tables, spark):
    A, B, _ = tables
    pairs = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3], "b": [1, 2, 3]}))
    cv = comparison_vectors(A, B, ["name", "surname"], pairs=pairs)
    assert cv.n == 3
    got = cv.omega.orderBy("a").toPandas()
    assert list(got["gamma_name"]) == [1.0, 0.0, 0.0]
