"""End-to-end unsupervised MEC goldens (reference inst/tinytest/test_mec.R)."""

import pytest

from automatedreclin_spark.fixtures import name_examples
from automatedreclin_spark.functions.comparators import jarowinkler_complement
from automatedreclin_spark.models.mec import mec


@pytest.fixture(scope="module")
def data(spark):
    return name_examples(spark)


def test_binary_mec_golden(data):
    A, B, true = data
    res = mec(A, B, variables=["name", "surname"], true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3, 4]
    assert list(m["b"]) == [1, 2, 3, 4]
    assert list(m["ratio"]) == pytest.approx([720.0] * 4, rel=1e-9)
    # b_params golden (test_mec.R:39-43)
    assert list(res.b_params["theta"]) == pytest.approx([1.0, 1.0], abs=1e-12)
    assert list(res.b_params["eta"]) == pytest.approx(
        [0.04166666666666667, 0.03333333333333333], abs=1e-12
    )
    # eval goldens: FLR=0, MMR=0.5, confusion (4,0,4,112) (test_mec.R:45-53)
    assert res.eval_metrics["FLR"] == 0.0
    assert res.eval_metrics["MMR"] == 0.5
    assert res.confusion == [[4, 4], [0, 112]]
    assert res.n == 120


def test_cpar_mec_golden(data):
    A, B, true = data
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_parametric", "surname": "continuous_parametric"}
    res = mec(A, B, variables=["name", "surname"], comparators=comp, methods=meth,
              true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    # cpar selects all 8 true matches (test_mec.R:66-70)
    assert list(m["a"]) == list(range(1, 9))
    assert list(m["b"]) == list(range(1, 9))

    p = res.cpar_params
    # Exact aggregate goldens (test_mec.R:72-82).
    assert list(p["p_0_M"]) == pytest.approx([0.625, 0.5], abs=1e-12)
    assert list(p["p_0_U"]) == pytest.approx(
        [0.041666666666666664, 0.03333333333333333], abs=1e-12
    )
    # Gamma shapes: the R goldens come from an nleqslv run that stops short of
    # the true root (f(golden) ≈ -0.03, f(ours) ≈ 1e-14) — assert 1% parity
    # plus our own exact-root property (tests/test_numerics.py).
    assert list(p["alpha_M"]) == pytest.approx([138.4622794465536, 120.6657058981201], rel=0.02)
    assert list(p["beta_M"]) == pytest.approx([2199.106791209967, 1974.529732878328], rel=0.02)
    assert list(p["alpha_U"]) == pytest.approx([6.516735740295028, 4.622775398311523], rel=0.02)
    assert list(p["beta_U"]) == pytest.approx([11.173089162681424, 7.167260899080440], rel=0.02)
    # mmr_est == flr_est for the size construction here (test_mec.R:95-104)
    assert res.mmr_est == pytest.approx(res.flr_est)


def test_mec_flr_mmr_constructions(data):
    A, B, _ = data
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_parametric", "surname": "continuous_parametric"}
    for sc in ("flr", "mmr"):
        res = mec(A, B, variables=["name", "surname"], comparators=comp,
                  methods=meth, set_construction=sc, target_rate=0.05)
        assert 0 <= res.flr_est <= 1
        assert 0 <= res.mmr_est <= 1


def test_mec_requires_perfect_agreement(spark):
    import pandas as pd
    A = spark.createDataFrame(pd.DataFrame({"a": [1], "name": ["x"]}))
    B = spark.createDataFrame(pd.DataFrame({"b": [1], "name": ["y"]}))
    with pytest.raises(ValueError, match="perfect agreement"):
        mec(A, B, variables=["name"])


def test_mec_one_to_one_contract(data):
    A, B, _ = data
    res = mec(A, B, variables=["name", "surname"])
    m = res.M_est.toPandas()
    assert m["a"].is_unique and m["b"].is_unique
    assert len(m) == round(res.n_M_est)


def test_cnonpar_mec_decision_parity(data):
    """cnonpar MEC selects exactly the four exact-agreement pairs with
    eval (FLR 0, MMR 0.5) — decision parity with test_mec.R:84-98 (exact
    ratio floats are RNG-dependent in the reference)."""
    A, B, true = data
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_nonparametric", "surname": "continuous_nonparametric"}
    res = mec(A, B, variables=["name", "surname"], comparators=comp,
              methods=meth, true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3, 4]
    assert list(m["b"]) == [1, 2, 3, 4]
    assert 3.0 <= res.n_M_est <= 5.0
    assert res.eval_metrics == {"FLR": 0.0, "MMR": 0.5}
    assert res.cnonpar_params is not None


def test_hit_miss_mec_decision_parity(data):
    """hit_miss MEC: golden match set (1..4, 1..4) and theta (1,1); eta is
    EM-init-dependent (loose tol_em stops before the fixed point) — assert
    5% parity with the R golden (0.04616, 0.03847) (test_mec.R:55-63)."""
    A, B, true = data
    meth = {"name": "hit_miss", "surname": "hit_miss"}
    res = mec(A, B, variables=["name", "surname"], methods=meth, true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3, 4]
    assert list(m["b"]) == [1, 2, 3, 4]
    assert list(res.hm_params["theta"]) == pytest.approx([1.0, 1.0], abs=1e-12)
    assert list(res.hm_params["eta"]) == pytest.approx(
        [0.04616298284003408, 0.03847198038861038], rel=0.05
    )
    # ratio within a few % of the R golden 573.098
    assert m["ratio"].iloc[0] == pytest.approx(573.0984617692614, rel=0.05)
    assert res.eval_metrics == {"FLR": 0.0, "MMR": 0.5}


def test_cnonpar_without_hurdle(data):
    """nonpar_hurdle=False: multivariate KLIEP on the full gamma vectors
    (unsupervised_learning.R:632-641). Less discriminating than the hurdle
    default at tiny scale — assert full recall of the true matches."""
    A, B, true = data
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_nonparametric", "surname": "continuous_nonparametric"}
    res = mec(A, B, variables=["name", "surname"], comparators=comp,
              methods=meth, nonpar_hurdle=False, true_matches=true)
    m = res.M_est.toPandas()
    got = {(r.a, r.b) for r in m.itertuples()}
    assert {(i, i) for i in range(1, 9)} <= got
    assert res.eval_metrics["MMR"] == 0.0
    assert m["a"].is_unique and m["b"].is_unique


def test_long_fit_iteration_cost_flat(spark):
    """A fit forced to run max_iter iterations (delta=0, eps=0 disable both
    convergence criteria) must have flat per-iteration cost: no cached-
    DataFrame accumulation (the loop unpersists the previous selection) and
    no lineage growth (scored is rebuilt from the persisted gamma base each
    iteration). Quadratic growth would make the 4x-longer run ~16x slower;
    assert well under that with headroom for timer noise."""
    import time

    import pandas as pd

    rows_a = [(i, f"n{i % 9}", f"s{i % 5}") for i in range(40)]
    rows_b = [(i, f"n{i % 9}", f"s{(i + (i % 3 == 0)) % 5}") for i in range(40)]
    A = spark.createDataFrame(pd.DataFrame(rows_a, columns=["a", "name", "surname"]))
    B = spark.createDataFrame(pd.DataFrame(rows_b, columns=["b", "name", "surname"]))

    def run(n_iter):
        t0 = time.time()
        res = mec(A, B, variables=["name", "surname"], delta=0.0, eps=0.0,
                  max_iter=n_iter)
        assert res.n_iter == n_iter
        return time.time() - t0, res

    run(3)                      # warm codegen / python workers
    t_short, _ = run(12)
    t_long, res = run(48)
    assert t_long < 7.0 * t_short, (t_short, t_long)

    # Plan-depth invariant, measured per iteration inside the loop: the
    # analyzed plan of the rebuilt scored Ω has EXACTLY the same line count
    # every iteration — any growth means lineage accumulates across
    # iterations and a 1000-iteration fit at scale would OOM the driver on
    # plan analysis alone.
    assert len(res.iter_plan_lines) == 48
    assert len(set(res.iter_plan_lines)) == 1, res.iter_plan_lines

    # Per-iteration wall time stays flat: the median of the last 12
    # iterations must not exceed a small multiple of the median of
    # iterations 2-13 (generous headroom for timer noise and concurrent
    # test load; linear lineage growth would give ~4x, quadratic far more).
    import statistics

    assert len(res.iter_seconds) == 48
    early = statistics.median(res.iter_seconds[1:13])
    late = statistics.median(res.iter_seconds[-12:])
    assert late < 3.0 * early + 0.05, (early, late, res.iter_seconds)


def test_hit_miss_em_spark_matches_numpy(spark, data):
    """The distributed EM (hit_miss_em_spark — per-iteration broadcast joins
    against the value tables, B never collected) must reproduce the numpy EM
    bit-for-summation-order: same domains, same RNG draws → u estimates equal
    to 1e-9. This is the scale path taken automatically when |B| exceeds
    MAX_B_ROWS_FOR_EM."""
    import numpy as np
    import pandas as pd

    from automatedreclin_spark.models.hit_miss import (
        fit_value_models,
        hit_miss_em,
        hit_miss_em_spark,
    )

    A, B, _ = data
    models = fit_value_models(A, B, ["name", "surname"])
    domains = {
        v: pd.DataFrame({"value": models[v].values, "m": models[v].m_est})
        for v in models
    }
    p_est = 0.3
    u_np = hit_miss_em(models, p_est, np.random.default_rng(11))
    u_sp = hit_miss_em_spark(B, ["name", "surname"], domains, p_est,
                             np.random.default_rng(11))
    for v in models:
        assert np.allclose(u_np[v], u_sp[v], atol=1e-9), v


def test_hit_miss_routes_to_spark_em_past_guard(spark, data, monkeypatch):
    """Past MAX_B_ROWS_FOR_EM, mec(hit_miss) must switch to the distributed
    EM instead of erroring, and still produce a valid one-to-one match set
    containing the exact-agreement pairs."""
    import automatedreclin_spark.models.hit_miss as hm
    import automatedreclin_spark.models.mec as mec_mod

    monkeypatch.setattr(hm, "MAX_B_ROWS_FOR_EM", 3)
    A, B, true = data
    res = mec_mod.mec(A, B, variables=["name", "surname"],
                      methods={"name": "hit_miss", "surname": "hit_miss"},
                      true_matches=true)
    m = res.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3, 4]
    assert list(m["b"]) == [1, 2, 3, 4]
    assert m["a"].is_unique and m["b"].is_unique


def test_hit_miss_value_domains_handle_nulls(spark):
    """NULL key values must not crash fit_value_domains (sorted() cannot
    compare None with str) and must join the value tables in the distributed
    EM — both paths code NULL as the string 'None' (the sentinel pandas
    astype(str) produces in the numpy path)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from automatedreclin_spark.models.hit_miss import (
        fit_value_domains,
        fit_value_models,
        hit_miss_em,
        hit_miss_em_spark,
    )

    schema = T.StructType([T.StructField("name", T.StringType())])
    A = spark.createDataFrame([("ann",), ("bob",), (None,), ("ann",)], schema)
    B = spark.createDataFrame([("ann",), (None,), ("cid",), (None,)], schema)

    domains, n_A = fit_value_domains(A, B, ["name"])
    assert "None" in list(domains["name"]["value"])
    # A has one NULL of 4 rows → m('None') = 0.25 (nulls hit the table)
    m_none = float(domains["name"].set_index("value").loc["None", "m"])
    assert abs(m_none - 0.25) < 1e-12

    u_sp = hit_miss_em_spark(B, ["name"], domains, 0.3,
                             np.random.default_rng(7), max_iter_em=3)
    assert abs(u_sp["name"].sum() - 1.0) < 1e-9

    # numpy path agrees when fed the same sorted domains
    models = fit_value_models(A, B, ["name"])
    dom_np = sorted(models["name"].values)
    assert dom_np == sorted(domains["name"]["value"])


def test_hit_miss_reseed_flag(data):
    """`hit_miss_reseed=True` re-seeds the EM per outer iteration from
    (seed, n_iter) instead of threading one shared stream: still fully
    deterministic (two runs agree exactly), same decisions on the golden
    scenario, and independent of draws consumed by earlier iterations. The
    default (shared stream) keeps R-golden stream compatibility and is
    covered by test_hit_miss_mec_decision_parity."""
    A, B, true = data
    meth = {"name": "hit_miss", "surname": "hit_miss"}
    r1 = mec(A, B, variables=["name", "surname"], methods=meth,
             true_matches=true, hit_miss_reseed=True)
    r2 = mec(A, B, variables=["name", "surname"], methods=meth,
             true_matches=true, hit_miss_reseed=True)
    m1 = r1.M_est.orderBy("a").toPandas()
    m2 = r2.M_est.orderBy("a").toPandas()
    assert m1.equals(m2)
    assert list(r1.hm_params["eta"]) == list(r2.hm_params["eta"])
    # decision parity with the golden match set holds under re-seeding
    assert list(m1["a"]) == [1, 2, 3, 4]
    assert list(m1["b"]) == [1, 2, 3, 4]
    assert list(r1.hm_params["theta"]) == pytest.approx([1.0, 1.0], abs=1e-12)


def test_mec_fused_finite_guard_still_raises(spark):
    """mec() fuses the C5 non-finite guard into its init aggregation
    (check_finite=False + finite_gamma_aggs); the reference-shaped error must
    still surface for a comparator that emits NaN."""
    import pandas as pd
    from pyspark.sql import functions as F

    A = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "name": ["x", "y"]}))
    B = spark.createDataFrame(pd.DataFrame({"b": [1, 2], "name": ["x", "z"]}))

    def nan_comparator(ca, cb):
        return F.when(ca == cb, float("nan")).otherwise(0.0)

    with pytest.raises(ValueError, match="missing or non-finite"):
        mec(A, B, variables=["name"], comparators={"name": nan_comparator},
            methods={"name": "continuous_parametric"})
