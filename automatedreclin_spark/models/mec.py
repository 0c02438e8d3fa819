"""Unsupervised maximum-entropy classifier (MEC) for record linkage.

Re-expresses the reference's flagship ``mec()`` entry point
(``unsupervised_learning.R:210-818``, traced in SURVEY.md §3.1) as a
driver-orchestrated fixed-point loop over an immutable, persisted Ω DataFrame:

  init     exact-agreement seed flag (raw-equality column) → U-side "denominator"
           parameters from all of Ω (one agg pass) → cached denominator column
  iterate  ratio column (params → Catalyst expr) → ĝ column → n_M = Σĝ (agg)
           → greedy one-to-one selection (T1) → M-side re-fit (one agg pass
           over the selected subset) → convergence on driver scalars
  finish   size / flr / mmr classification-set construction (T3/T4)

Per iteration the distributed work is: 1 aggregation over Ω, 1 selection, and
1 aggregation over M — all on the persisted gamma base, no shuffle of Ω
itself. Parameters are tiny driver dicts (K ~ handful of variables).

Scale note: unblocked mode collects (a, b, ratio) for the greedy sweep —
faithful to the reference's global semantics and fine for candidate-bounded
inputs. The 10^12-pair path is blocked mode (``block_col=...``), where
selection runs per block via applyInPandas (see operators/selection.py).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from automatedreclin_spark.models import families as fam
from automatedreclin_spark.operators.comparison import (
    comparison_vectors,
    finite_gamma_aggs,
    gamma_name,
    raise_if_nonfinite,
)
from automatedreclin_spark.operators.pairs import has_perfect_agreement
from automatedreclin_spark.operators.selection import (
    SelectionSummary,
    select_mec_pairs,
    summarize_mec_selection,
)
from automatedreclin_spark.evaluation import evaluation, get_metrics, get_confusion

ALLOWED_METHODS = ("binary", "continuous_parametric", "continuous_nonparametric", "hit_miss")


@dataclass
class MecResult:
    M_est: DataFrame                      # selected pairs (a, b, ratio)
    n_M_est: float
    flr_est: float
    mmr_est: float
    iter_bisection: int | None
    n: int                                # |Ω|
    n_iter: int
    variables: list[str]
    set_construction: str
    b_params: pd.DataFrame | None = None
    cpar_params: pd.DataFrame | None = None
    cnonpar_params: pd.DataFrame | None = None
    hm_params: pd.DataFrame | None = None
    kliep_models: dict | None = None
    eval_metrics: dict[str, float] | None = None
    confusion: list[list[int]] | None = None
    scored: DataFrame | None = None       # final Ω with ratio / g_est columns
    dropped_variables: list[str] = field(default_factory=list)
    convergence_reason: str | None = None
    #: flr/mmr bisection strategy that ran ("exact_collect" | "distributed");
    #: None in size mode. Lets oracles gate the distributed path.
    bisection_strategy: str | None = None
    # Per-iteration diagnostics for the constant-depth invariant: wall seconds
    # and the analyzed-plan line count of the rebuilt scored Ω. The plan lines
    # MUST be constant from iteration 1 — any growth means lineage is
    # accumulating across iterations (the scale bug the rebuild-from-persisted-
    # omega design exists to prevent). Guarded by tests/test_mec.py.
    iter_seconds: list[float] = field(default_factory=list)
    iter_plan_lines: list[int] = field(default_factory=list)
    #: per-iteration split of iter_seconds: the Σĝ aggregation pass vs the
    #: greedy selection (sweep + truncation + rejoin + M-side stats).
    iter_substage_seconds: list[dict[str, float]] = field(default_factory=list)
    #: coarse wall-clock per fit stage ("init_agg" = cache materialization +
    #: U-side sufficient stats, "seeds" = seed-match count, "final_summary" =
    #: post-loop scored persist + set construction) — lets the heavy bench
    #: attribute the fit wall to a stage instead of guessing.
    stage_seconds: dict[str, float] = field(default_factory=dict)


def _validate_methods(methods: dict[str, str] | None, variables: list[str]) -> dict[str, str]:
    """Default every variable to `binary`; whitelist check (reference
    ``validate_methods`` internals.R:171-195)."""
    methods = dict(methods or {})
    out = {}
    for v in variables:
        m = methods.get(v, "binary")
        if m not in ALLOWED_METHODS:
            raise ValueError(f"Method '{m}' for variable '{v}' is not supported. "
                             f"Allowed: {ALLOWED_METHODS}.")
        out[v] = m
    return out


def mec(
    A: DataFrame,
    B: DataFrame,
    variables: list[str],
    comparators: dict | None = None,
    methods: dict[str, str] | None = None,
    duplicates_in_A: bool = False,
    start_params: dict[str, Any] | None = None,
    set_construction: str = "size",
    target_rate: float = 0.03,
    max_iter_bisection: int = 100,
    tol: float = 0.005,
    delta: float = 0.5,
    eps: float = 0.05,
    max_iter: int = 1000,
    nonpar_hurdle: bool = True,
    true_matches: DataFrame | None = None,
    pairs: DataFrame | None = None,
    block_col: str | None = None,
    a_col: str = "a",
    b_col: str = "b",
    seed: int = 1,
    kliep_control=None,
    hit_miss_reseed: bool = False,
    verbose: bool = False,
    exact_collect_max: int | None = None,
) -> MecResult:
    """Unsupervised MEC fit. ``A`` / ``B`` must carry record-id columns
    ``a_col`` / ``b_col`` (stable ids — NOT positional indices).

    ``pairs`` restricts Ω to a candidate set (e.g. from blocking); ``block_col``
    additionally routes the greedy selection through the per-block exact path.
    """
    if set_construction not in ("size", "flr", "mmr"):
        raise ValueError("`set_construction` should be one of: size, flr, mmr.")
    methods = _validate_methods(methods, variables)
    if any(v not in A.columns for v in variables):
        raise ValueError("Not all variables are present in A.")
    if any(v not in B.columns for v in variables):
        raise ValueError("Not all variables are present in B.")

    if not has_perfect_agreement(A, B, variables):
        raise ValueError(
            "There are no records with perfect agreement on the key variables. "
            "Please provide relevant datasets."
        )

    # Exact-agreement seed matches M⁰ (J3, unsupervised_learning.R:267-271)
    # are defined on ALL original variables (the reference builds M before
    # dropping constants). Their count within Ω and the per-row membership
    # flag are fused into Ω as a raw-equality ``_seed`` column below — no
    # join materialization, no semi join over Ω's keys.
    all_variables = list(variables)

    kept, dropped = fam.drop_constant_variables(A, B, variables)
    if not kept:
        raise ValueError("All key variables are constant; nothing to compare.")
    variables = kept
    methods = {v: methods[v] for v in variables}
    if comparators:
        comparators = {k: v for k, v in comparators.items() if k in variables}

    # check_finite=False: the C5 guard fuses into the init aggregation below
    # (same error, one less full pass over Ω — comparator UDFs are the
    # expensive part of every uncached scan).
    cv = comparison_vectors(
        A, B, variables, comparators=comparators, pairs=pairs,
        a_col=a_col, b_col=b_col, check_finite=False,
        seed_flag_variables=all_variables,
    )
    omega = cv.omega
    n_A, n_B = cv.n_A, cv.n_B
    cap = float(min(n_A, n_B))


    b_vars = [v for v in variables if methods[v] == "binary"]
    cpar_vars = [v for v in variables if methods[v] == "continuous_parametric"]
    cnonpar_vars = [v for v in variables if methods[v] == "continuous_nonparametric"]
    hm_vars = [v for v in variables if methods[v] == "hit_miss"]
    b_gammas = [gamma_name(v) for v in b_vars]
    cpar_gammas = [gamma_name(v) for v in cpar_vars]
    cnonpar_gammas = [gamma_name(v) for v in cnonpar_vars]
    hm_gammas = [gamma_name(v) for v in hm_vars]

    rng = np.random.default_rng(seed)
    start_params = dict(start_params or {})
    if b_vars and "binary" not in start_params:
        start_params["binary"] = {"theta": rng.uniform(0.9, 1.0, len(b_vars)).tolist()}
    if cpar_vars and "continuous_parametric" not in start_params:
        start_params["continuous_parametric"] = {
            "p_0_M": rng.uniform(0.8, 0.9, len(cpar_vars)).tolist(),
            "alpha_M": rng.uniform(0.1, 1.0, len(cpar_vars)).tolist(),
            "beta_M": rng.uniform(10.0, 20.0, len(cpar_vars)).tolist(),
        }
    if cnonpar_gammas and "continuous_nonparametric" not in start_params:
        start_params["continuous_nonparametric"] = {
            "p_0_M": rng.uniform(0.5, 1.0, len(cnonpar_gammas)).tolist(),
        }
    if hm_gammas and "hit_miss" not in start_params:
        start_params["hit_miss"] = {"theta": rng.uniform(0.9, 1.0, len(hm_gammas)).tolist()}

    # ---- init: U-side ("denominator") parameters from ALL of Ω -------------
    # One fused aggregation: |Ω|, the C5 finite guard, and every family's
    # U-side sufficient statistics. On the non-cnonpar path the gamma base is
    # persisted FIRST, so this init pass is also the cache-materializing pass
    # — comparators execute exactly once per pair for the whole fit.
    if not cnonpar_gammas:
        omega = omega.persist(StorageLevel.MEMORY_AND_DISK)
    init_aggs: list = [F.count(F.lit(1)).alias("_n")]
    init_aggs += finite_gamma_aggs(cv.gamma_cols)
    if b_gammas:
        init_aggs += fam.binary_fit_aggs(b_gammas, "eta")
    if cpar_gammas:
        init_aggs += fam.cpar_fit_aggs(cpar_gammas, "U")
    if cnonpar_gammas:
        init_aggs += [
            F.avg((F.col(g) == 0).cast("double")).alias(f"np_p0U_{g}")
            for g in cnonpar_gammas
        ]
    if hm_gammas:
        init_aggs += fam.binary_fit_aggs(hm_gammas, "hm_eta")
    # Seed-match count within Ω (|exact_match_pairs(A,B) ∩ Ω|,
    # unsupervised_learning.R:313-317) fused into the same pass — replacing a
    # semi join that shuffled every (a, b) key of Ω (218 s of the r5
    # 400M-pair heavy anchor). The raw-equality _seed flag replicates the
    # equi-join exactly (NULL never agrees; goes through the values, not the
    # lossy gammas).
    init_aggs.append(F.count(F.when(F.col("_seed"), 1)).alias("_n_seeds"))
    stage_seconds: dict[str, float] = {}
    _stage_t0 = time.time()
    init_row = omega.agg(*init_aggs).collect()[0].asDict()
    stage_seconds["init_agg"] = round(time.time() - _stage_t0, 2)
    raise_if_nonfinite(init_row, variables, cv.gamma_cols)
    n = int(init_row["_n"])
    cv._n = n

    theta_b = list(start_params.get("binary", {}).get("theta", []))
    eta_b = [float(init_row[f"eta_{g}"]) for g in b_gammas]
    theta_hm = list(start_params.get("hit_miss", {}).get("theta", []))
    eta_hm = [float(init_row[f"hm_eta_{g}"]) for g in hm_gammas]
    hm_value_models = None
    hm_domains = None
    if hm_gammas:
        from automatedreclin_spark.models.hit_miss import (
            MAX_B_ROWS_FOR_EM,
            fit_value_domains,
            fit_value_models,
        )

        if n_B <= MAX_B_ROWS_FOR_EM:
            # small/medium B: collect value codes, numpy EM (R-parity floats)
            hm_value_models = fit_value_models(A, B, hm_vars)
        else:
            # scale path: EM as per-iteration joins against the tiny value
            # tables — B is never collected (hit_miss_em_spark)
            hm_domains, _ = fit_value_domains(A, B, hm_vars)

    p_0_M = list(start_params.get("continuous_parametric", {}).get("p_0_M", []))
    alpha_M = list(start_params.get("continuous_parametric", {}).get("alpha_M", []))
    beta_M = list(start_params.get("continuous_parametric", {}).get("beta_M", []))
    p_0_U, alpha_U, beta_U = ([], [], [])
    if cpar_gammas:
        p_0_U, alpha_U, beta_U = fam.cpar_params_from_row(init_row, cpar_gammas, "U")

    # Cache the invariant denominator columns (the b_/cpar_denominator trick,
    # unsupervised_learning.R:380,417) and persist the gamma base once.
    denom_cols = {}
    if b_gammas:
        denom_cols["b_denominator"] = fam.bernoulli_product_expr(b_gammas, eta_b)
    if cpar_gammas:
        denom_cols["cpar_denominator"] = fam.hurdle_gamma_product_expr(
            cpar_gammas, p_0_U, alpha_U, beta_U
        )
    if cnonpar_gammas:
        # Seed-membership flag drives the random cnonpar ratio init
        # (unsupervised_learning.R:428-456); per-row uniforms derive from
        # xxhash64(a, b) — deterministic across partitionings, unlike F.rand.
        # Same fusion as the seed count: membership is the row-local raw-
        # equality flag — no join against the seed equi-join.
        omega = omega.withColumn(
            "_is_seed", F.coalesce(F.col("_seed"), F.lit(False)))
        omega = omega.withColumns(denom_cols).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        # The gamma base is already persisted (init pass materialized it);
        # the invariant denominators are pure column arithmetic over cached
        # gammas, so they stay a LAZY projection — no second cache copy.
        omega = omega.withColumns(denom_cols)

    cnonpar_expr = None
    np_p0_M: list[float] = []
    np_p0_U: list[float] = []
    kliep_models: dict[str, object] = {}
    if cnonpar_gammas and nonpar_hurdle:
        np_p0_M = list(start_params["continuous_nonparametric"]["p_0_M"])
        np_p0_U = [float(init_row[f"np_p0U_{g}"]) for g in cnonpar_gammas]
        terms = []
        for i, g in enumerate(cnonpar_gammas):
            u = (F.pmod(F.xxhash64(F.col("a"), F.col("b"), F.lit(i), F.lit(seed)),
                        F.lit(1_000_000)) / 1_000_000.0)
            r_temp = F.when(F.col("_is_seed"), 5.0 + 5.0 * u).otherwise(0.1 + 0.9 * u)
            mass0 = np_p0_M[i] / np_p0_U[i] if np_p0_U[i] else float("inf")
            mass_pos = (1.0 - np_p0_M[i]) / (1.0 - np_p0_U[i]) if np_p0_U[i] < 1 else float("inf")
            terms.append(
                F.when(F.col(g) == 0, F.lit(mass0)).otherwise(F.lit(mass_pos) * r_temp)
            )
        from functools import reduce as _reduce
        cnonpar_expr = _reduce(lambda x, y: x * y, terms)
    elif cnonpar_gammas:
        # nonpar_hurdle=False init: multiply the current ratio by random
        # factors — U(5,10) on exact-agreement seeds, U(0.1,5) elsewhere
        # (unsupervised_learning.R:458-470), hash-derived per row.
        u = (F.pmod(F.xxhash64(F.col("a"), F.col("b"), F.lit(seed)),
                    F.lit(1_000_000)) / 1_000_000.0)
        cnonpar_expr = F.when(F.col("_is_seed"), 5.0 + 5.0 * u).otherwise(0.1 + 4.9 * u)

    def ratio_expr(th_b, p0m, am, bm, np_expr, th_hm, et_hm):
        expr = F.lit(1.0)
        if b_gammas:
            expr = expr * (fam.bernoulli_product_expr(b_gammas, th_b) / F.col("b_denominator"))
        if cpar_gammas:
            expr = expr * (
                fam.hurdle_gamma_product_expr(cpar_gammas, p0m, am, bm)
                / F.col("cpar_denominator")
            )
        if np_expr is not None:
            expr = expr * np_expr
        if hm_gammas:
            # hm denominator is NOT invariant (eta is re-estimated from the
            # EM each iteration, unsupervised_learning.R:735-745).
            expr = expr * (
                fam.bernoulli_product_expr(hm_gammas, th_hm)
                / fam.bernoulli_product_expr(hm_gammas, et_hm)
            )
        return expr

    scored = omega.withColumn(
        "ratio",
        ratio_expr(theta_b, p_0_M, alpha_M, beta_M, cnonpar_expr, theta_hm, eta_hm),
    )

    # Seed matches within Ω (exact_match_idx, unsupervised_learning.R:313-317)
    # — already counted by the fused init aggregation.
    n_M_count = int(init_row["_n_seeds"])
    stage_seconds["seeds"] = 0.0
    n_M = float(n_M_count)

    theta_b_old = list(theta_b)
    theta_hm_old = list(theta_hm)
    cpar_old = (list(p_0_M), list(alpha_M), list(beta_M))
    n_iter = 0
    convergence_reason = None
    M_selected: DataFrame | None = None
    M_prev: DataFrame | None = None
    # Count feeding the ĝ column of the CURRENT iteration (i.e. the previous
    # iteration's selection size) — the reference keeps exactly this ĝ for
    # the final flr/mmr summary (unsupervised_learning.R:492-500), NOT a
    # recompute with the post-selection count.
    n_M_count_for_g = n_M_count

    # M-side sufficient statistics (constant column set across iterations) —
    # fused with the selection-size count into ONE aggregation job per
    # iteration over the persisted selection.
    m_aggs: list = [F.count(F.lit(1)).alias("_n_sel")]
    if b_gammas:
        m_aggs += fam.binary_fit_aggs(b_gammas, "theta")
    if cpar_gammas:
        m_aggs += fam.cpar_fit_aggs(cpar_gammas, "M")
    if hm_gammas:
        m_aggs += fam.binary_fit_aggs(hm_gammas, "hm_theta")

    iter_seconds: list[float] = []
    iter_plan_lines: list[int] = []
    iter_substage_seconds: list[dict[str, float]] = []
    while n_iter < max_iter:
        n_iter += 1
        _iter_t0 = time.time()
        # (a) posterior ĝ with n_M = |M_idx| from the previous selection,
        #     then n_M ← Σĝ capped at min(n_A, n_B).
        n_M_count_for_g = n_M_count
        scored = scored.withColumn("g_est", fam.g_est_expr(n_M_count, n))
        n_M_old = n_M
        _sub_t0 = time.time()
        g_sum = scored.agg(F.sum("g_est")).collect()[0][0]
        _g_sum_sec = time.time() - _sub_t0
        n_M = min(float(g_sum), cap)

        # (b) greedy one-to-one M ← top-n_M by ratio (T1). n_pairs=n skips
        # the unblocked routing count — |Ω| is already known and constant.
        _sub_t0 = time.time()
        M_selected = select_mec_pairs(
            scored, n_M, duplicates_in_A=duplicates_in_A, block_col=block_col,
            n_pairs=n,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        m_row = M_selected.agg(*m_aggs).collect()[0].asDict()
        iter_substage_seconds.append(
            {"g_sum": round(_g_sum_sec, 2),
             "select": round(time.time() - _sub_t0, 2)}
        )
        n_M_count = int(m_row["_n_sel"])
        # The previous selection is no longer referenced once the new one is
        # materialized — drop its cached blocks so long fits (max_iter ≫ 10)
        # don't accumulate one persisted DataFrame per iteration.
        if M_prev is not None:
            M_prev.unpersist()
        M_prev = M_selected
        if n_M_count == 0:
            convergence_reason = "empty_selection"
            iter_seconds.append(time.time() - _iter_t0)
            break

        # (c) convergence: |Δn_M| < delta or ‖Δparams‖₂ < eps (from iter 2);
        #     with cnonpar variables only the count criterion applies
        #     (unsupervised_learning.R:536-548).
        if n_iter >= 2:
            if abs(n_M_old - n_M) < delta:
                convergence_reason = "n_M_delta"
                iter_seconds.append(time.time() - _iter_t0)
                break
            if not cnonpar_gammas:
                old = np.array(theta_b_old + cpar_old[0] + cpar_old[1] + cpar_old[2]
                               + theta_hm_old)
                new = np.array(theta_b + p_0_M + alpha_M + beta_M + theta_hm)
                if len(old) and float(np.linalg.norm(old - new)) < eps:
                    convergence_reason = "param_eps"
                    iter_seconds.append(time.time() - _iter_t0)
                    break

        # (d) re-estimate M-side parameters from the current selection —
        #     the sufficient stats were already fused into the selection-size
        #     aggregation at (b); just read them out.
        if b_gammas:
            theta_b_old = list(theta_b)
            theta_b = [float(m_row[f"theta_{g}"]) for g in b_gammas]
        if cpar_gammas:
            cpar_old = (list(p_0_M), list(alpha_M), list(beta_M))
            p_0_M, alpha_M, beta_M = fam.cpar_params_from_row(
                m_row, cpar_gammas, "M", fallback_beta=cpar_old[2]
            )
        if cnonpar_gammas and not nonpar_hurdle:
            # Multivariate KLIEP on the full gamma vectors
            # (unsupervised_learning.R:632-641).
            import warnings

            from automatedreclin_spark.models.kliep import (
                collect_gamma_matrix,
                fit_kliep_multi,
                kliep_multi_udf,
            )

            U_df = scored.join(M_selected.select("a", "b"), ["a", "b"], "left_anti")
            x_num = collect_gamma_matrix(M_selected, cnonpar_gammas, seed=seed)
            x_den = collect_gamma_matrix(U_df, cnonpar_gammas, seed=seed)
            try:
                model = fit_kliep_multi(
                    x_num, x_den, seed=seed,
                    n_folds=(kliep_control.nfold
                             if kliep_control and kliep_control.nfold is not None
                             else 5),
                )
                cnonpar_expr = kliep_multi_udf(model, cnonpar_gammas)
                kliep_models = {"__multi__": model}
            except Exception as e:  # noqa: BLE001
                warnings.warn(f"KLIEP issue in mec(): {e}; using the previous ratio estimate.")
        elif cnonpar_gammas:
            # Refit hurdle masses + per-variable KLIEP on M vs U positives
            # (unsupervised_learning.R:588-627). On failure keep the previous
            # cnonpar ratio term (warning semantics of warn_kliep_once).
            import warnings

            from automatedreclin_spark.models.kliep import (
                collect_positive_gammas,
                fit_kliep,
                kliep_hurdle_ratio_expr,
            )

            U_df = scored.join(M_selected.select("a", "b"), ["a", "b"], "left_anti")
            p0_rows = M_selected.agg(*[
                F.avg((F.col(g) == 0).cast("double")).alias(g) for g in cnonpar_gammas
            ]).collect()[0].asDict()
            p0_u_rows = U_df.agg(*[
                F.avg((F.col(g) == 0).cast("double")).alias(g) for g in cnonpar_gammas
            ]).collect()[0].asDict()
            new_models: dict[str, object] = {}
            fitted_any = False
            for g in cnonpar_gammas:
                x_num = collect_positive_gammas(M_selected, g, seed=seed)
                x_den = collect_positive_gammas(U_df, g, seed=seed)
                if len(x_num) >= 2 and len(x_den) >= 2:
                    try:
                        new_models[g] = fit_kliep(x_num, x_den, seed=seed,
                                                  control=kliep_control)
                        fitted_any = True
                    except Exception as e:  # noqa: BLE001 - mirror tryCatch
                        warnings.warn(f"KLIEP issue in mec() for {g}: {e}")
                        new_models[g] = None
                else:
                    new_models[g] = None
            if fitted_any:
                np_p0_M = [float(p0_rows[g]) for g in cnonpar_gammas]
                np_p0_U = [float(p0_u_rows[g]) for g in cnonpar_gammas]
                kliep_models = new_models
                missing = [g for g, m in new_models.items() if m is None]
                if missing:
                    warnings.warn(
                        "KLIEP issue in mec(): using only the hurdle mass term "
                        f"for {missing} in the current iteration."
                    )
                cnonpar_expr = kliep_hurdle_ratio_expr(
                    cnonpar_gammas, np_p0_M, np_p0_U, kliep_models
                )
            else:
                warnings.warn(
                    "KLIEP issue in mec(): could not be fitted in the current "
                    "iteration; using the previous ratio estimate."
                )

        if hm_gammas:
            # Hit-miss EM: theta from M, u-distribution EM over B, eta from
            # the value model (unsupervised_learning.R:647-746).
            from types import SimpleNamespace

            from automatedreclin_spark.models.hit_miss import (
                hit_miss_em,
                hit_miss_em_spark,
                hit_miss_eta,
            )

            theta_hm_old = list(theta_hm)
            theta_hm = [float(m_row[f"hm_theta_{g}"]) for g in hm_gammas]
            p_est = n_M / max(n_A, n_B)
            # One generator threaded through iterations (like R's global RNG
            # stream): iteration k's EM init depends on draws consumed by
            # iterations <k. Deterministic given `seed`; kept over per-
            # iteration re-seeding because the loose-tol EM is init-dependent
            # and this stream reproduces the R goldens (test_mec.R:55-63).
            # ``hit_miss_reseed=True`` opts into a per-iteration stream keyed
            # on (seed, n_iter): iteration k's EM init then does NOT depend
            # on how many draws earlier iterations consumed — results become
            # insertable/resumable per iteration, at the cost of R-golden
            # stream compatibility.
            em_rng = (np.random.default_rng([seed, n_iter])
                      if hit_miss_reseed else rng)
            if hm_value_models is not None:
                u = hit_miss_em(hm_value_models, p_est, em_rng)
                eta_models = hm_value_models
            else:
                u = hit_miss_em_spark(B, hm_vars, hm_domains, p_est, em_rng)
                eta_models = {
                    v: SimpleNamespace(m_est=hm_domains[v]["m"].to_numpy())
                    for v in hm_vars
                }
            eta_map = hit_miss_eta(eta_models, u, p_est, n_A)
            eta_hm = [float(eta_map[v]) for v in hm_vars]

        scored = omega.withColumn(
            "ratio",
            ratio_expr(theta_b, p_0_M, alpha_M, beta_M, cnonpar_expr, theta_hm, eta_hm),
        )
        # Constant-depth invariant: the rebuilt Ω's analyzed plan must not
        # grow with the iteration count (free JVM string render, no job).
        iter_plan_lines.append(
            scored._jdf.queryExecution().analyzed().toString().count("\n")
        )
        iter_seconds.append(time.time() - _iter_t0)
        if verbose:
            print(f"[mec] iter={n_iter} n_M={n_M:.4f} theta_b={theta_b} "
                  f"p_0_M={p_0_M} alpha_M={alpha_M} beta_M={beta_M}")

    n_M_est = n_M
    # Final scored Ω for set construction: ratio from the last parameter
    # update, ĝ exactly as computed at the top of the final iteration — from
    # the PREVIOUS iteration's selection count (unsupervised_learning.R:
    # 492-500), not the post-selection count of the final iteration.
    scored = scored.withColumn("g_est", fam.g_est_expr(n_M_count_for_g, n))
    # scored stays a LAZY projection over the persisted gamma base: ratio and
    # ĝ are cheap column arithmetic over cached columns, so persisting here
    # would only write a SECOND full-size copy of Ω into the cache — at the
    # 400M-pair heavy anchor that second copy (~15-18 GB on top of the base's
    # 15-18 GB) is exactly what churned the store into re-spill and made the
    # final summary/fit wall balloon. Downstream passes (selection sweep,
    # summary aggs, registry consumers of MecResult.scored) all recompute the
    # projection from the cache instead.

    _stage_t0 = time.time()
    summary: SelectionSummary = summarize_mec_selection(
        scored,
        n_M_est,
        duplicates_in_A=duplicates_in_A,
        set_construction=set_construction,
        target_rate=target_rate,
        tol=tol,
        max_iter=max_iter_bisection,
        block_col=block_col,
        exact_collect_max=exact_collect_max,
        n_pairs=n,
    )
    M_est = summary.selected.select("a", "b", "ratio")
    stage_seconds["final_summary"] = round(time.time() - _stage_t0, 2)

    eval_metrics = confusion = None
    if true_matches is not None:
        counts = evaluation(M_est, true_matches, n)
        eval_metrics = get_metrics(counts.TP, counts.FP, counts.FN, counts.TN)
        confusion = get_confusion(counts.TP, counts.FP, counts.FN, counts.TN)

    def _param_table(cols, **vectors):
        if not cols:
            return None
        return pd.DataFrame({"variable": cols, **vectors})

    return MecResult(
        M_est=M_est,
        n_M_est=n_M_est,
        flr_est=summary.flr_est,
        mmr_est=summary.mmr_est,
        iter_bisection=summary.iter,
        bisection_strategy=summary.strategy,
        n=n,
        n_iter=n_iter,
        variables=variables,
        set_construction=set_construction,
        b_params=_param_table(b_gammas, theta=theta_b, eta=eta_b),
        cpar_params=_param_table(
            cpar_gammas, p_0_M=p_0_M, alpha_M=alpha_M, beta_M=beta_M,
            p_0_U=p_0_U, alpha_U=alpha_U, beta_U=beta_U,
        ),
        cnonpar_params=_param_table(
            cnonpar_gammas if nonpar_hurdle else [],
            p_0_M_cnonpar=np_p0_M, p_0_U_cnonpar=np_p0_U,
        ),
        hm_params=_param_table(hm_gammas, theta=theta_hm, eta=eta_hm),
        kliep_models=kliep_models or None,
        eval_metrics=eval_metrics,
        confusion=confusion,
        scored=scored,
        dropped_variables=dropped,
        convergence_reason=convergence_reason,
        iter_seconds=iter_seconds,
        iter_plan_lines=iter_plan_lines,
        iter_substage_seconds=iter_substage_seconds,
        stage_seconds=stage_seconds,
    )
