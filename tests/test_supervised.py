"""Supervised train/predict goldens (reference
inst/tinytest/test_supervised_learning.R)."""

import pandas as pd
import pytest

from automatedreclin_spark.functions.comparators import jarowinkler_complement
from automatedreclin_spark.models.supervised import predict_rec_lin, train_rec_lin

from tests.test_comparison_vectors import DF_1, DF_2, MATCHES

DF_NEW_1 = pd.DataFrame({
    "a": range(1, 6),
    "name": ["John", "Emily", "Mark", "Anna", "David"],
    "surname": ["Smith", "Johnson", "Taylor", "Williams", "Brown"],
})
DF_NEW_2 = pd.DataFrame({
    "b": range(1, 5),
    "name": ["John", "Emely", "Mark", "Michael"],
    "surname": ["Smitth", "Johnson", "Tailor", "Henders"],
})


@pytest.fixture(scope="module")
def tables(spark):
    return (
        spark.createDataFrame(DF_1),
        spark.createDataFrame(DF_2),
        spark.createDataFrame(MATCHES),
        spark.createDataFrame(DF_NEW_1),
        spark.createDataFrame(DF_NEW_2),
        spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3], "b": [1, 2, 3]})),
    )


def test_train_binary_goldens(tables):
    A, B, matches, *_ = tables
    model = train_rec_lin(A, B, matches, variables=["name", "surname"])
    assert list(model.b_params["theta"]) == pytest.approx([0.5, 0.5], abs=1e-12)
    assert list(model.b_params["eta"]) == pytest.approx([0.02, 0.02], abs=1e-12)
    assert model.pi_est == pytest.approx(0.04)
    assert model.match_prop == pytest.approx(0.4)


def test_prob_ratio_2_downgrade_warning(tables):
    A, B, matches, *_ = tables
    with pytest.warns(UserWarning, match='Switching the probability ratio to "1"'):
        model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                              prob_ratio="2")
    assert model.prob_ratio == "1"


def test_train_cpar_goldens(tables):
    A, B, matches, *_ = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_parametric", "surname": "continuous_parametric"}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                          comparators=comp, methods=meth)
    p = model.cpar_params
    assert list(p["p_0_M"]) == pytest.approx([0.5, 0.5], abs=1e-12)
    assert list(p["p_0_Omega"]) == pytest.approx([0.02, 0.02], abs=1e-12)
    # Gamma shapes at 2% (R golden solver under-converges; see test_mec.py).
    assert list(p["alpha_M"]) == pytest.approx([224.66614858286, 15.6594672317296], rel=0.02)
    assert list(p["alpha_Omega"]) == pytest.approx([5.40715230665299, 6.10501979494463], rel=0.02)
    assert list(p["beta_M"]) == pytest.approx([2516.26086412805, 176.169006356958], rel=0.02)
    assert list(p["beta_Omega"]) == pytest.approx([7.97541509248072, 9.36329003837691], rel=0.02)


def test_predict_binary_goldens(tables):
    A, B, matches, newA, newB, _ = tables
    model = train_rec_lin(A, B, matches, variables=["name", "surname"])
    pred = predict_rec_lin(model, newA, newB)
    m = pred.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 2, 3]
    assert list(m["b"]) == [1, 2, 3]
    assert list(m["ratio"]) == pytest.approx([12.755102040816336] * 3, rel=1e-9)
    assert pred.n_M_est == pytest.approx(3.3540191586838794, rel=1e-9)


def test_predict_cpar_goldens(tables):
    A, B, matches, newA, newB, true = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_parametric", "surname": "continuous_parametric"}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                          comparators=comp, methods=meth)
    pred = predict_rec_lin(model, newA, newB, true_matches=true)
    m = pred.M_est.orderBy("a").toPandas()
    assert list(m["a"]) == [1, 3]
    assert list(m["b"]) == [1, 3]
    assert pred.n_M_est == pytest.approx(2.0000005610797560, rel=1e-4)
    assert pred.mmr_est == 0
    assert pred.eval_metrics["FLR"] == 0.0
    assert pred.eval_metrics["MMR"] == pytest.approx(1 / 3)
    assert pred.confusion == [[2, 1], [0, 17]]


def test_predict_rate_constructions(tables):
    A, B, matches, newA, newB, _ = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_parametric", "surname": "continuous_parametric"}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                          comparators=comp, methods=meth)
    for sc in ("flr", "mmr"):
        pred = predict_rec_lin(model, newA, newB, set_construction=sc, target_rate=0.1)
        assert 0 <= pred.flr_est <= 1
        assert 0 <= pred.mmr_est <= 1


def test_custom_ml_model_plugin(tables):
    """A14 extension point: any callable producing a `prob` column."""
    from pyspark.sql import functions as F

    A, B, matches, newA, newB, _ = tables
    model = train_rec_lin(A, B, matches, variables=["name", "surname"])
    # toy classifier: prob = 0.9 when names agree, else 0.05
    model.ml_model = lambda omega: omega.withColumn(
        "prob", F.when(F.col("gamma_name") == 1, 0.9).otherwise(0.05)
    )
    pred = predict_rec_lin(model, newA, newB)
    m = pred.M_est.toPandas()
    assert {(r.a, r.b) for r in m.itertuples()} >= {(1, 1), (3, 3)}


def test_train_predict_cnonpar(tables):
    """cnonpar (KLIEP) supervised path: golden hurdle masses
    (test_supervised_learning.R:119-135) + decision parity on predictions
    (M_est set {(1,1),(2,2),(3,3)}, mmr 0; :209-221)."""
    A, B, matches, newA, newB, _ = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_nonparametric", "surname": "continuous_nonparametric"}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                          comparators=comp, methods=meth)
    p = model.cnonpar_params
    assert list(p["p_0_M_cnonpar"]) == pytest.approx([0.5, 0.5], abs=1e-12)
    assert list(p["p_0_U_cnonpar"]) == pytest.approx([0.02, 0.02], abs=1e-12)
    pred = predict_rec_lin(model, newA, newB)
    m = pred.M_est.orderBy("a").toPandas()
    assert {(r.a, r.b) for r in m.itertuples()} == {(1, 1), (2, 2), (3, 3)}
    assert pred.mmr_est == 0


def test_kliep_control_reference_defaults(spark):
    """control_kliep parity (controls.R:19-25): nfold=2 and numerator points
    as kernel centers reproduce the reference's hurdle-ratio identity of
    test_supervised_learning.R:133-155 — ratio(γ=0) = p0M/p0U exactly, and
    ratio(γ>0) = (1−p0M)/(1−p0U)·r⁺(γ) with r⁺ from the 2-fold KLIEP fit."""
    import numpy as np

    from automatedreclin_spark.models.kliep import (
        KliepControl,
        fit_kliep,
        kliep_hurdle_ratio_expr,
    )

    ctrl = KliepControl(nfold=2, centers="numerator")
    x_num = np.array([0.1, 0.2, 0.3])
    x_den = np.array([0.2, 0.4, 0.6])
    m = fit_kliep(x_num, x_den, control=ctrl)
    # densityratio behavior: the numerator points ARE the centers
    assert m.centers.tolist() == [0.1, 0.2, 0.3]
    # KLIEP normalization constraint: mean_r over the denominator sample = 1
    assert float(m.predict(x_den).mean()) == pytest.approx(1.0, rel=1e-6)
    pred = float(m.predict(np.array([0.4]))[0])
    assert pred > 0

    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.4)], "id long, gamma_name double"
    )
    out = (
        df.withColumn("r", kliep_hurdle_ratio_expr(
            ["gamma_name"], [0.4], [0.2], {"gamma_name": m}))
        .orderBy("id").toPandas()
    )
    assert out["r"].iloc[0] == pytest.approx(0.4 / 0.2, abs=1e-12)
    assert out["r"].iloc[1] == pytest.approx((1 - 0.4) / (1 - 0.2) * pred, rel=1e-9)


def test_kliep_control_scale_roundtrip():
    """scale='numerator'/'denominator' standardizes inputs at fit time and
    the model applies the same (mu, sd) at scoring time — predictions remain
    a valid density ratio (denominator-mean 1) under either scaling."""
    import numpy as np

    from automatedreclin_spark.models.kliep import KliepControl, fit_kliep

    rng = np.random.default_rng(3)
    x_num = rng.gamma(2.0, 2.0, 300)
    x_den = rng.gamma(1.2, 1.0, 400)
    for scale in ("numerator", "denominator"):
        m = fit_kliep(x_num, x_den, control=KliepControl(nfold=2, scale=scale))
        assert (m.mu, m.sd) != (0.0, 1.0)
        r_den = m.predict(x_den)
        assert np.isfinite(r_den).all() and (r_den >= 0).all()
        assert float(r_den.mean()) == pytest.approx(1.0, rel=1e-6)


def test_kliep_control_plumbs_through_train(tables):
    """kliep_control reaches the KLIEP fits inside train_rec_lin: with
    reference defaults (nfold=2, numerator centers) the cnonpar path still
    reproduces the golden hurdle masses and prediction decisions."""
    from automatedreclin_spark.models.kliep import KliepControl

    A, B, matches, newA, newB, _ = tables
    comp = {"name": jarowinkler_complement(), "surname": jarowinkler_complement()}
    meth = {"name": "continuous_nonparametric", "surname": "continuous_nonparametric"}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"],
                          comparators=comp, methods=meth,
                          kliep_control=KliepControl(nfold=2, centers="numerator"))
    p = model.cnonpar_params
    assert list(p["p_0_M_cnonpar"]) == pytest.approx([0.5, 0.5], abs=1e-12)
    pred = predict_rec_lin(model, newA, newB)
    m = pred.M_est.orderBy("a").toPandas()
    assert {(r.a, r.b) for r in m.itertuples()} == {(1, 1), (2, 2), (3, 3)}


def test_kliep_control_inherits_explicit_kwargs():
    """A control that only sets `scale` must NOT silently reset the caller's
    explicit n_centers/n_folds to package defaults (unset control fields are
    None = inherit)."""
    import numpy as np

    from automatedreclin_spark.models.kliep import KliepControl, fit_kliep

    rng = np.random.default_rng(3)
    x_num = rng.gamma(2.0, 0.1, 400)
    x_den = rng.gamma(1.2, 0.3, 400)
    m = fit_kliep(x_num, x_den, n_centers=50,
                  control=KliepControl(scale="numerator"))
    assert len(m.centers) == 50
    # and a set control field still wins over the kwarg default
    m2 = fit_kliep(x_num, x_den, control=KliepControl(n_centers=25))
    assert len(m2.centers) == 25


def test_train_is_single_pass_no_persist(tables, spark):
    """Scale contract for supervised training: on the binary/cpar path the
    full-cross-product Ω streams through ONE fused conditional aggregation —
    no persist (nothing cached after training) and exactly one job touches
    Ω (the C5 guard, |Ω|, M-side, denominator, and feasibility stats all
    come out of the same collect)."""
    A, B, matches, *_ = tables

    before = {r for r in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    model = train_rec_lin(A, B, matches, variables=["name", "surname"])
    after = {r for r in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    assert after <= before, "binary-path training must not persist Ω"
    assert list(model.b_params["theta"]) == pytest.approx([0.5, 0.5], abs=1e-12)
    assert list(model.b_params["eta"]) == pytest.approx([0.02, 0.02], abs=1e-12)

    # ratio-2 FEASIBLE toy (both variables agree somewhere among nonmatches):
    # the fused pass must pick the U-denominated statistics without a second
    # scan and without downgrading.
    A2 = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2], "name": ["john", "anna"], "surname": ["smith", "jones"]}))
    B2 = spark.createDataFrame(pd.DataFrame({
        "b": [1, 2, 3], "name": ["john", "anna", "john"],
        "surname": ["smith", "jones", "jones"]}))
    m2 = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": [1, 2]}))
    model2 = train_rec_lin(A2, B2, m2, variables=["name", "surname"],
                           prob_ratio="2")
    assert model2.prob_ratio == "2"
    # U = {(1,2),(1,3),(2,1),(2,3)}: name agrees on (1,3) → eta_name = 1/4;
    # surname agrees on (2,3) → eta_surname = 1/4
    assert list(model2.b_params["eta"]) == pytest.approx([0.25, 0.25], abs=1e-12)
    assert list(model2.b_params["theta"]) == pytest.approx([1.0, 1.0], abs=1e-12)
