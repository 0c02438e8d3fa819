"""Supervised record-linkage model: train on labeled pairs, predict on new data.

Re-expresses ``train_rec_lin()`` (supervised_learning.R:142-434) and
``predict.rec_lin_model()`` (predict.R:115-273). Training is single-shot —
M and U are known from labels — so the whole fit is ONE fused
conditional-aggregation pass over Ω (|Ω| count, C5 finite guard, M-side +
denominator sufficient statistics, prob-ratio-2 feasibility, cnonpar hurdle
masses) plus driver-side Newton solves for the Gamma shapes; the training
cross product streams through partial aggregates and is never materialized
(except for KLIEP sample collection). Prediction scores a
new Ω with the stored parameters (pure column expression) and derives n_M
either in closed form (prob-ratio "1") or via a driver-side Newton-accelerated
fixed point whose every function evaluation is a single agg over the cached
scored Ω (A11, ``fixed_n_M`` internals.R:558-562).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from automatedreclin_spark.models import families as fam
from automatedreclin_spark.models.mec import _validate_methods
from automatedreclin_spark.operators.comparison import (
    comparison_vectors,
    finite_gamma_aggs,
    gamma_name,
    raise_if_nonfinite,
)
from automatedreclin_spark.operators.pairs import (
    has_perfect_agreement,
    label_pairs,
    validate_pairs_membership,
)
from automatedreclin_spark.operators.selection import summarize_mec_selection
from automatedreclin_spark.evaluation import evaluation, get_metrics, get_confusion


@dataclass
class RecLinModel:
    variables: list[str]
    comparators: dict
    methods: dict[str, str]
    prob_ratio: str
    pi_est: float
    match_prop: float
    b_params: pd.DataFrame | None = None
    cpar_params: pd.DataFrame | None = None
    cnonpar_params: pd.DataFrame | None = None
    kliep_models: dict | None = None
    #: optional custom classifier: callable(omega_with_gammas) -> DataFrame
    #: with an added `prob` column (A14 extension point, predict.R:163-194).
    ml_model: Callable[[DataFrame], DataFrame] | None = None


@dataclass
class RecLinPredictions:
    M_est: DataFrame
    n_M_est: float
    flr_est: float
    mmr_est: float
    set_construction: str
    iter: int | None = None
    eval_metrics: dict | None = None
    confusion: list | None = None
    scored: DataFrame | None = None


def train_rec_lin(
    A: DataFrame,
    B: DataFrame,
    matches: DataFrame,
    variables: list[str],
    comparators: dict | None = None,
    methods: dict[str, str] | None = None,
    prob_ratio: str = "1",
    a_col: str = "a",
    b_col: str = "b",
    kliep_control=None,
) -> RecLinModel:
    """One-shot supervised fit. ``matches`` is DataFrame[a, b] of known match
    pairs (validated like reference internals.R:122-159). ``kliep_control``:
    a models.kliep.KliepControl for reference-parity KLIEP knobs
    (control_kliep, controls.R:19-25)."""
    if prob_ratio not in ("1", "2"):
        raise ValueError('`prob_ratio` should be "1" or "2".')
    methods = _validate_methods(methods, variables)

    if not has_perfect_agreement(A, B, variables):
        raise ValueError(
            "There are no records with perfect agreement on the key variables. "
            "Please provide relevant datasets."
        )

    kept, dropped = fam.drop_constant_variables(A, B, variables)
    for v in dropped:
        warnings.warn(f"The variable {v} has only one unique value and has been removed.")
    variables = kept
    methods = {v: methods[v] for v in variables}
    if comparators:
        comparators = {k: v for k, v in comparators.items() if k in variables}

    validate_pairs_membership(matches, A, B, a_col=a_col, b_col=b_col)

    # check_finite=False: the C5 guard is FUSED into the training aggregation
    # below instead of paying its own pass — training Ω is the full A×B cross
    # product (reference semantics: the denominator statistics come from all
    # pairs, supervised_learning.R:142-254), so every avoided pass matters.
    cv = comparison_vectors(
        A, B, variables, comparators=comparators,
        a_col=a_col, b_col=b_col, check_finite=False,
    )
    # count first so the label join can be broadcast (matches is a join
    # output whose size ESTIMATE blocks the automatic broadcast — the SMJ
    # alternative shuffles + sorts the whole training cross product)
    n_M = matches.count()
    omega = label_pairs(cv.omega, matches, n_matches=n_M)

    b_vars = [v for v in variables if methods[v] == "binary"]
    cpar_vars = [v for v in variables if methods[v] == "continuous_parametric"]
    cnonpar_vars = [v for v in variables if methods[v] == "continuous_nonparametric"]
    b_gammas = [gamma_name(v) for v in b_vars]
    cpar_gammas = [gamma_name(v) for v in cpar_vars]
    cnonpar_gammas = [gamma_name(v) for v in cnonpar_vars]

    # ---- ONE streaming aggregation over Ω ---------------------------------
    # Training is single-shot (M and U are known from labels), so |Ω|, the C5
    # finite guard, M-side and denominator sufficient statistics, the
    # prob-ratio-2 feasibility checks, and the cnonpar hurdle masses all fuse
    # into a single conditional-aggregation job: the cross product streams
    # through partial aggregates once and is NEVER materialized or persisted
    # (the KLIEP sample collection below is the only exception).
    is_match = F.col("match") == 1
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    aggs += finite_gamma_aggs(cv.gamma_cols)
    if b_gammas:
        aggs += fam.binary_fit_aggs(b_gammas, "theta", where=is_match)
        aggs += fam.binary_fit_aggs(b_gammas, "eta")          # Ω denominator
    if cpar_gammas:
        aggs += fam.cpar_fit_aggs(cpar_gammas, "M", where=is_match)
        aggs += fam.cpar_fit_aggs(cpar_gammas, "D")           # Ω denominator
    if prob_ratio == "2":
        # U-denominated statistics + the feasibility checks, computed in the
        # same pass; which set is used is decided after the collect.
        if b_gammas:
            aggs += fam.binary_fit_aggs(b_gammas, "etaU", where=~is_match)
        if cpar_gammas:
            aggs += fam.cpar_fit_aggs(cpar_gammas, "DU", where=~is_match)
        for v in variables:
            g = F.col(gamma_name(v))
            agree = (g == 1) if methods[v] == "binary" else (g == 0)
            aggs.append(
                F.max(F.when(~is_match, agree.cast("int"))).alias(f"_chk_{gamma_name(v)}")
            )
    for g in cnonpar_gammas:
        zero = (F.col(g) == 0).cast("double")
        aggs.append(F.avg(F.when(is_match, zero)).alias(f"_p0m_{g}"))
        aggs.append(F.avg(zero).alias(f"_p0o_{g}"))
        aggs.append(F.avg(F.when(~is_match, zero)).alias(f"_p0u_{g}"))

    row = omega.agg(*aggs).collect()[0].asDict()
    raise_if_nonfinite(row, variables, cv.gamma_cols)
    n = int(row["_n"])
    cv._n = n
    cv.match_prop = n_M / n * max(cv.n_A, cv.n_B) if n else None
    pi_est = n_M / n

    # prob-ratio "2" feasibility: every variable must show agreement among the
    # nonmatches, else downgrade to "1" with a warning
    # (supervised_learning.R:220-236).
    if prob_ratio == "2":
        ok = all(int(row[f"_chk_{gamma_name(v)}"] or 0) == 1 for v in variables)
        if not ok:
            prob_ratio = "1"
            warnings.warn(
                'Some variables lack common values between the unmatches. '
                'Switching the probability ratio to "1".'
            )

    denom_label = "Omega" if prob_ratio == "1" else "U"
    d_b_prefix = "eta" if prob_ratio == "1" else "etaU"
    d_c_prefix = "D" if prob_ratio == "1" else "DU"

    b_params = cpar_params = None
    if b_gammas:
        b_params = pd.DataFrame({
            "variable": b_gammas,
            "theta": [float(row[f"theta_{g}"]) for g in b_gammas],
            "eta": [float(row[f"{d_b_prefix}_{g}"]) for g in b_gammas],
        })
    if cpar_gammas:
        p_0_M, alpha_M, beta_M = fam.cpar_params_from_row(row, cpar_gammas, "M")
        p_0_D, alpha_D, beta_D = fam.cpar_params_from_row(row, cpar_gammas, d_c_prefix)
        cpar_params = pd.DataFrame({
            "variable": cpar_gammas,
            "p_0_M": p_0_M, f"p_0_{denom_label}": p_0_D,
            "alpha_M": alpha_M, f"alpha_{denom_label}": alpha_D,
            "beta_M": beta_M, f"beta_{denom_label}": beta_D,
        })

    cnonpar_params = None
    kliep_models: dict | None = None
    if cnonpar_gammas:
        # One-shot KLIEP hurdle fit: M vs Ω (ratio-1) or U (ratio-2)
        # (supervised_learning.R:323-407). The hurdle masses came out of the
        # fused aggregation; only the KLIEP SAMPLE collection still needs
        # extra passes over Ω, so this is the one branch that persists it.
        from automatedreclin_spark.models.kliep import (
            collect_positive_gammas,
            fit_kliep,
        )

        omega = omega.persist(StorageLevel.MEMORY_AND_DISK)
        M = omega.filter(is_match)
        denom_df = omega if prob_ratio == "1" else omega.filter(~is_match)
        p0d_key = "_p0o_" if prob_ratio == "1" else "_p0u_"
        kliep_models = {}
        missing = []
        for g in cnonpar_gammas:
            x_num = collect_positive_gammas(M, g)
            x_den = collect_positive_gammas(denom_df, g)
            if len(x_num) >= 2 and len(x_den) >= 2:
                try:
                    kliep_models[g] = fit_kliep(x_num, x_den, control=kliep_control)
                    continue
                except Exception:  # noqa: BLE001
                    pass
            kliep_models[g] = None
            missing.append(g)
        if missing:
            warnings.warn(
                f"KLIEP issue in train_rec_lin() for {missing}: insufficient "
                "positive comparisons; using only the hurdle mass term for "
                "those variables."
            )
        cnonpar_params = pd.DataFrame({
            "variable": cnonpar_gammas,
            "p_0_M_cnonpar": [float(row[f"_p0m_{g}"]) for g in cnonpar_gammas],
            "p_0_U_cnonpar": [float(row[f"{p0d_key}{g}"]) for g in cnonpar_gammas],
        })
        omega.unpersist()

    return RecLinModel(
        variables=variables,
        comparators=cv.comparators,
        methods=methods,
        prob_ratio=prob_ratio,
        pi_est=pi_est,
        match_prop=cv.match_prop,
        b_params=b_params,
        cpar_params=cpar_params,
        cnonpar_params=cnonpar_params,
        kliep_models=kliep_models,
    )


def _score_ratio(omega: DataFrame, model: RecLinModel) -> DataFrame:
    """Replay the stored parametric ratio on a new Ω (``score_mec_ratio``
    internals.R:749-831) as one column expression."""
    expr = F.lit(1.0)
    denom_label = "Omega" if model.prob_ratio == "1" else "U"
    if model.b_params is not None:
        gs = list(model.b_params["variable"])
        theta = list(model.b_params["theta"])
        eta = list(model.b_params["eta"])
        expr = expr * (
            fam.bernoulli_product_expr(gs, theta) / fam.bernoulli_product_expr(gs, eta)
        )
    if model.cpar_params is not None:
        p = model.cpar_params
        gs = list(p["variable"])
        expr = expr * (
            fam.hurdle_gamma_product_expr(gs, list(p["p_0_M"]), list(p["alpha_M"]), list(p["beta_M"]))
            / fam.hurdle_gamma_product_expr(
                gs, list(p[f"p_0_{denom_label}"]), list(p[f"alpha_{denom_label}"]), list(p[f"beta_{denom_label}"])
            )
        )
    if model.cnonpar_params is not None:
        from automatedreclin_spark.models.kliep import kliep_hurdle_ratio_expr

        p = model.cnonpar_params
        expr = expr * kliep_hurdle_ratio_expr(
            list(p["variable"]),
            list(p["p_0_M_cnonpar"]),
            list(p["p_0_U_cnonpar"]),
            model.kliep_models or {},
        )
    return omega.withColumn("ratio", expr)


def _fixed_point_newton(f: Callable[[float], float], x0: float, max_iter: int = 50,
                        tol: float = 1e-6) -> float:
    """Newton-accelerated fixed point: root of g(x) = f(x) − x with a
    finite-difference derivative (FixedPoint::FixedPoint(Method="Newton")
    analogue). Each f() call is one Spark aggregation by construction."""
    x = x0
    for _ in range(max_iter):
        gx = f(x) - x
        if abs(gx) < tol:
            return x
        h = max(1e-4, abs(x) * 1e-4)
        gxh = f(x + h) - (x + h)
        deriv = (gxh - gx) / h
        if deriv == 0 or not (deriv == deriv):  # NaN guard
            x = f(x)  # fall back to plain iteration
            continue
        x_new = x - gx / deriv
        if x_new < 0:
            x_new = f(x)
        if abs(x_new - x) < tol:
            return x_new
        x = x_new
    return x


def predict_rec_lin(
    model: RecLinModel,
    newdata_A: DataFrame,
    newdata_B: DataFrame,
    duplicates_in_A: bool = False,
    set_construction: str = "size",
    target_rate: float = 0.03,
    tol: float = 0.005,
    max_iter: int = 50,
    true_matches: DataFrame | None = None,
    pairs: DataFrame | None = None,
    block_col: str | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> RecLinPredictions:
    """Score new record sets with a trained model and build the match set."""
    # check_finite=False: the C5 guard and |Ω| fuse into the first
    # aggregation over the PERSISTED scored Ω below — that aggregation is
    # also the cache-materializing pass, so the comparators run exactly once
    # per pair (previously: guard pass + count pass + materialization).
    cv = comparison_vectors(
        newdata_A, newdata_B, model.variables, comparators=model.comparators,
        pairs=pairs, a_col=a_col, b_col=b_col, check_finite=False,
    )
    n_A, n_B = cv.n_A, cv.n_B
    prob_est = model.match_prop / max(n_A, n_B)

    if model.ml_model is not None:
        scored = model.ml_model(cv.omega)
        scored = scored.withColumn(
            "ratio",
            F.col("prob") * (1.0 - prob_est) / ((1.0 - F.col("prob")) * prob_est),
        )
    else:
        scored = _score_ratio(cv.omega, model)
    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)

    guard_pairs = [(v, g) for v, g in zip(model.variables, cv.gamma_cols)
                   if g in scored.columns]
    if len(guard_pairs) < len(cv.gamma_cols):
        # Rare custom-ml path that dropped gamma columns: run the standalone
        # guard on the raw Ω instead (one extra pass, custom models only).
        from automatedreclin_spark.operators.comparison import _assert_finite_gammas

        _assert_finite_gammas(cv.omega, model.variables, cv.gamma_cols)
        guard_pairs = []
    guard_vars = [v for v, _ in guard_pairs]
    guard_cols = [g for _, g in guard_pairs]
    base_aggs = [F.count(F.lit(1)).alias("_n")] + finite_gamma_aggs(guard_cols)

    n_M_start = float(min(n_A, n_B))
    if model.prob_ratio == "1" and model.ml_model is None:
        # Ratio-I shortcut: ĝ = min(prob_est · r, 1) (predict.R:202-207) —
        # |Ω|, the guard counters and Σĝ come out of one fused agg.
        scored = scored.withColumn(
            "g_est", F.least(F.lit(1.0), F.lit(prob_est) * F.col("ratio"))
        )
        row = scored.agg(*base_aggs, F.sum("g_est").alias("_g_sum")) \
            .collect()[0].asDict()
        raise_if_nonfinite(row, guard_vars, guard_cols)
        n = int(row["_n"])
        cv._n = n
        n_M_est = min(float(row["_g_sum"]), n_M_start)
    else:
        # Priming fused agg (materializes the cache, checks the guard, gives
        # |Ω|), then the fixed-point Newton for n_M (predict.R:208-217) —
        # each evaluation is one agg over the cached scored Ω.
        row = scored.agg(*base_aggs).collect()[0].asDict()
        raise_if_nonfinite(row, guard_vars, guard_cols)
        n = int(row["_n"])
        cv._n = n

        def f(n_M: float) -> float:
            return float(
                scored.agg(F.sum(fam.g_est_expr(n_M, n))).collect()[0][0]
            )

        n_M_est = _fixed_point_newton(f, n_M_start, max_iter=50)
        n_M_est = float(round(max(0.0, min(n_M_est, n_M_start))))
        scored = scored.withColumn("g_est", fam.g_est_expr(n_M_est, n))

    summary = summarize_mec_selection(
        scored, n_M_est, duplicates_in_A=duplicates_in_A,
        set_construction=set_construction, target_rate=target_rate,
        tol=tol, max_iter=max_iter, block_col=block_col,
    )
    M_est = summary.selected.select("a", "b", "ratio")

    eval_metrics = confusion = None
    if true_matches is not None:
        counts = evaluation(M_est, true_matches, n)
        eval_metrics = get_metrics(counts.TP, counts.FP, counts.FN, counts.TN)
        confusion = get_confusion(counts.TP, counts.FP, counts.FN, counts.TN)

    return RecLinPredictions(
        M_est=M_est,
        n_M_est=n_M_est,
        flr_est=summary.flr_est,
        mmr_est=summary.mmr_est,
        set_construction=set_construction,
        iter=summary.iter,
        eval_metrics=eval_metrics,
        confusion=confusion,
        scored=scored,
    )
