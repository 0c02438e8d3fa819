"""Greedy one-to-one selection semantics.

The ascending/invalid-guard unit vectors are ported verbatim from the
reference golden tests (inst/tinytest/test_mec_blocking.R:37-76)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from automatedreclin_spark.operators.selection import (
    greedy_select_local,
    select_mec_pairs,
    summarize_mec_selection,
)


def _pairs(selected_idx, a, b):
    return {(a[i], b[i]) for i in selected_idx}


def test_inverted_greedy_reference_vectors():
    # internals select_inverted_mec_indices golden cases
    a = np.array([1, 1, 2, 2]); b = np.array([1, 2, 1, 2])
    ratio = np.array([2.0, 0.1, 0.2, np.inf])
    sel = greedy_select_local(a, b, ratio, n_M=2, ascending=True, invalid_to_never=True)
    assert _pairs(sel, a, b) == {(1, 2), (2, 1)}

    a = np.array([1, 2]); b = np.array([1, 2])
    sel = greedy_select_local(a, b, np.array([np.nan, 0.5]), n_M=1,
                              ascending=True, invalid_to_never=True)
    assert _pairs(sel, a, b) == {(2, 2)}

    sel = greedy_select_local(a, b, np.array([-1.0, 0.3]), n_M=1,
                              ascending=True, invalid_to_never=True)
    assert _pairs(sel, a, b) == {(2, 2)}

    sel = greedy_select_local(a, b, np.array([0.1, 0.2]), n_M=0,
                              ascending=True, invalid_to_never=True)
    assert len(sel) == 0


def test_descending_greedy_one_to_one():
    a = np.array([1, 1, 2, 2])
    b = np.array([1, 2, 1, 2])
    ratio = np.array([10.0, 9.0, 8.0, 1.0])
    sel = greedy_select_local(a, b, ratio, n_M=4)
    # (1,1) taken first; (1,2)/(2,1) blocked by used records; (2,2) next
    assert _pairs(sel, a, b) == {(1, 1), (2, 2)}


def test_duplicates_in_A_only_constrains_a():
    a = np.array([1, 1, 2])
    b = np.array([1, 1, 1])
    ratio = np.array([5.0, 4.0, 3.0])
    sel = greedy_select_local(a, b, ratio, n_M=3, duplicates_in_A=True)
    assert _pairs(sel, a, b) == {(1, 1), (2, 1)}


def test_round_half_even_budget():
    a = np.arange(1, 6); b = np.arange(1, 6)
    ratio = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    # n_M = 2.5 -> round-half-even = 2
    assert len(greedy_select_local(a, b, ratio, n_M=2.5)) == 2
    # n_M = 3.5 -> 4
    assert len(greedy_select_local(a, b, ratio, n_M=3.5)) == 4


def test_blocked_equals_unblocked(spark):
    rng = np.random.default_rng(3)
    n = 400
    pdf = pd.DataFrame({
        "a": rng.integers(1, 60, n),
        "b": rng.integers(1, 60, n),
        "ratio": rng.uniform(0, 10, n),
    }).drop_duplicates(["a", "b"])
    # disjoint blocks: block id determined by a-range so records stay in one block
    pdf["block"] = (pdf["a"] % 4).astype("int64")
    pdf = pdf[(pdf["b"] % 4) == (pdf["a"] % 4)]  # keep b in the same block partitioning
    df = spark.createDataFrame(pdf)
    n_M = 25.0
    blocked = select_mec_pairs(df, n_M, block_col="block").select("a", "b").toPandas()
    unblocked = select_mec_pairs(df, n_M).select("a", "b").toPandas()
    key = lambda p: set(map(tuple, p.to_numpy()))
    assert key(blocked) == key(unblocked)


def test_summarize_size_mode(spark):
    pdf = pd.DataFrame({
        "a": [1, 2, 3, 4], "b": [1, 2, 3, 4],
        "ratio": [100.0, 50.0, 2.0, 0.1],
        "g_est": [1.0, 0.9, 0.3, 0.0],
    })
    df = spark.createDataFrame(pdf)
    s = summarize_mec_selection(df, n_M_est=2.0, set_construction="size")
    sel = s.selected.orderBy("a").toPandas()
    assert list(sel["a"]) == [1, 2]
    assert s.flr_est == pytest.approx(1 - (1.0 + 0.9) / 2)
    assert s.mmr_est == pytest.approx(max(0.0, min(1.0, 1 - 1.9 / 2)))


def test_summarize_flr_bisection(spark):
    rng = np.random.default_rng(5)
    n = 500
    ratio = np.concatenate([rng.uniform(50, 100, 50), rng.uniform(0, 1, n - 50)])
    g = np.where(ratio > 10, 0.98, 0.02)
    pdf = pd.DataFrame({"a": np.arange(n), "b": np.arange(n), "ratio": ratio, "g_est": g})
    df = spark.createDataFrame(pdf)
    s = summarize_mec_selection(df, n_M_est=50.0, set_construction="flr",
                                target_rate=0.03, tol=0.01)
    assert 0 <= s.flr_est <= 1
    n_sel = s.selected.count()
    assert 0 < n_sel <= n


# ------------------------------------------------ retain_top_n (T6 scale) ---

def _topn_reference(df, n_keep, score_col, tie_cols):
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc_nulls_last(score_col),
                       *[F.asc(c) for c in tie_cols])
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= n_keep).drop("_rk"))


def _keyset(df):
    return set(map(tuple, df.select("a", "b", "block").collect()))


@pytest.mark.parametrize("scenario", ["continuous", "heavy_ties", "with_nulls",
                                      "all_one_value"])
def test_retain_top_n_matches_global_window(spark, scenario):
    """retain_top_n must select EXACTLY the rows the reference global
    row_number window selects (q_est desc nulls last, a/b/block asc),
    including massive tie sets at the cut and NULL scores."""
    import numpy as np

    from automatedreclin_spark.operators.selection import retain_top_n

    rng = np.random.default_rng(17)
    n = 5000
    a = rng.integers(1, 400, n)
    b = rng.integers(1, 800, n)
    block = rng.integers(1, 10, n)
    if scenario == "continuous":
        score = rng.normal(size=n)
    elif scenario == "heavy_ties":
        score = rng.choice([0.1, 0.5, 0.9], size=n)   # binary-gamma shape
    elif scenario == "with_nulls":
        score = rng.normal(size=n)
        score[rng.random(n) < 0.3] = np.nan           # → NULL below
    else:
        score = np.full(n, 2.5)                        # one giant tie set
    pdf = pd.DataFrame({"a": a, "b": b, "block": block, "score": score})
    pdf = pdf.drop_duplicates(["a", "b", "block"])     # Ω keys are unique
    pdf["score"] = pdf["score"].astype(object).where(pdf["score"].notna(), None)
    df = spark.createDataFrame(pdf, schema="a long, b long, block long, score double")

    for n_keep in (0, 1, 37, len(pdf) // 2, len(pdf) - 1, len(pdf), len(pdf) + 5):
        got = retain_top_n(df, n_keep, "score", ("a", "b", "block"))
        want = _topn_reference(df, n_keep, "score", ("a", "b", "block"))
        assert _keyset(got) == _keyset(want), (scenario, n_keep)


def test_retain_top_n_plan_has_no_global_single_partition_exchange(spark):
    """The alpha-path scale gate: the retention plan must not funnel the full
    input through Exchange SinglePartition (a window over a boundary TIE SET
    is acceptable — it never sees more than the tie rows)."""
    import numpy as np

    from automatedreclin_spark.operators.selection import retain_top_n

    rng = np.random.default_rng(3)
    n = 20000
    pdf = pd.DataFrame({
        "a": np.arange(n), "b": np.arange(n) + 7, "block": np.arange(n) % 16,
        "score": rng.normal(size=n),
    })
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    got = retain_top_n(df, n // 3, "score", ("a", "b", "block"))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" not in plan, plan
    # and it still selects the right rows
    want = _topn_reference(df, n // 3, "score", ("a", "b", "block"))
    assert _keyset(got) == _keyset(want)
    df.unpersist()


# --------------------------------------- flr/mmr distributed bisection ------

def _continuous_omega(spark, n):
    """Deterministic Ω with ~n distinct continuous ratios and a g_est
    correlated with ratio (no RNG — xxhash64-derived uniforms)."""
    df = spark.range(n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(2 ** 40)) / F.lit(2.0 ** 40))
        .alias("u"),
    )
    return df.select(
        "a", "b",
        (F.col("u") * 10.0).alias("ratio"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-8.0 * (F.col("u") - 0.5))))
        .alias("g_est"),
    )


def test_flr_mmr_distributed_bisection_no_collect(spark, monkeypatch):
    """Continuous-gamma Ω with ≥10⁶ distinct ratios: the flr/mmr bisection
    must never collect the distinct-ratio table (toPandas is poisoned) and
    must still hit the target rate within tol."""
    from pyspark.sql import DataFrame

    omega = _continuous_omega(spark, 1_200_000).persist()
    n_total = omega.count()
    assert omega.select("ratio").distinct().count() > 1_000_000

    def boom(self, *a, **k):
        raise AssertionError("distributed flr/mmr path must not collect")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    summary = summarize_mec_selection(omega, n_M_est=n_total * 0.4,
                                      set_construction="flr",
                                      target_rate=0.05, tol=0.005)
    assert abs(summary.flr_est - 0.05) <= 0.005, summary.flr_est
    # flr_est must be consistent with the returned set
    agg = summary.selected.agg(F.count(F.lit(1)).alias("n"),
                               F.sum("g_est").alias("g")).collect()[0]
    assert abs((1.0 - float(agg["g"]) / agg["n"]) - summary.flr_est) < 1e-9
    monkeypatch.undo()

    summary_m = summarize_mec_selection(omega, n_M_est=n_total * 0.4,
                                        set_construction="mmr",
                                        target_rate=0.1, tol=0.01)
    assert abs(summary_m.mmr_est - 0.1) <= 0.01, summary_m.mmr_est
    omega.unpersist()


def test_flr_distributed_matches_exact_collect_path(spark, monkeypatch):
    """Both strategies probe bit-identical thresholds, so forcing the
    exact-collect path on the same Ω must give the same iteration count,
    the same selected set size, and the same rates."""
    import automatedreclin_spark.operators.selection as sel

    omega = _continuous_omega(spark, 150_000).persist()  # > 65,536 distinct
    kw = dict(n_M_est=60_000.0, set_construction="flr",
              target_rate=0.04, tol=0.004)
    dist = summarize_mec_selection(omega, **kw)
    n_dist = dist.selected.count()
    monkeypatch.setattr(sel, "MAX_DISTINCT_RATIO_COLLECT", 10 ** 12)
    exact = summarize_mec_selection(omega, **kw)
    assert dist.iter == exact.iter
    assert n_dist == exact.selected.count()
    assert abs(dist.flr_est - exact.flr_est) < 1e-9
    assert abs(dist.mmr_est - exact.mmr_est) < 1e-9
    omega.unpersist()
