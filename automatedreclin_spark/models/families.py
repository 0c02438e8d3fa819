"""Model-family math as Catalyst column expressions + driver-side fits.

Each family follows the sufficient-statistics pattern (reference
``alpha_formula_summary`` internals.R:72-86): fitting = one DataFrame ``agg``
pass producing a handful of scalars per variable; scoring = a pure column
expression parameterized by those scalars. Nothing here collects pair rows.

Families (reference ``unsupervised_learning.R`` / ``supervised_learning.R``):
- binary: Bernoulli per 0/1 gamma — density θ^γ(1−θ)^(1−γ) per variable
  (``bernoulli_product`` internals.R:358-375). For γ∈{0,1} this equals
  γ·θ + (1−γ)·(1−θ), an exact product-form Catalyst expression.
- continuous_parametric: hurdle Gamma — p0 at γ=0, (1−p0)·Gamma(γ;α,β) at γ>0
  (``hurdle_gamma_density`` internals.R:100-103). lgamma(α), α·log β and
  log(1−p0) are driver scalars, so the per-row expression needs only
  log/exp — no lgamma builtin required.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automatedreclin_spark.functions.numerics import gamma_shape_newton


# ---------------------------------------------------------------- binary ----

def bernoulli_product_expr(gamma_cols: list[str], probs: list[float]) -> Column:
    """∏_k θ_k^{γ_k} (1−θ_k)^{1−γ_k} for 0/1 gammas — exact dbinom product
    (internals.R:358-370), folded left in variable order for float parity."""
    terms = [
        F.col(g) * float(p) + (1.0 - F.col(g)) * float(1.0 - p)
        for g, p in zip(gamma_cols, probs)
    ]
    return reduce(lambda x, y: x * y, terms)


def binary_fit_aggs(gamma_cols: list[str], prefix: str,
                    where: Column | None = None) -> list[Column]:
    """θ_k = mean(γ_k) over the fit set (``binary_formula`` internals.R:17-23).

    ``where`` restricts the fit set WITHOUT a separate filtered scan: the
    column is nulled outside the subset and avg skips nulls, so M-side,
    U-side and Ω-side statistics fuse into one aggregation job."""
    src = (lambda g: F.when(where, F.col(g))) if where is not None else F.col
    return [F.avg(src(g)).alias(f"{prefix}_{g}") for g in gamma_cols]


# ------------------------------------------------------ hurdle Gamma (cpar) --

def hurdle_gamma_product_expr(
    gamma_cols: list[str],
    p_0: list[float],
    alpha: list[float],
    beta: list[float],
) -> Column:
    """∏_k [p0_k]^{I(γ=0)} [(1−p0_k)·Gamma(γ;α_k,β_k)]^{I(γ>0)}
    (``hurdle_gamma_product`` internals.R:378-391). Gamma pdf in log space
    with driver-side constants: C = α·log β − lgamma(α)."""
    terms = []
    for g, p0, a, b in zip(gamma_cols, p_0, alpha, beta):
        log_c = a * math.log(b) - math.lgamma(a)
        dens_pos = (1.0 - p0) * F.exp(
            F.lit(log_c) + (a - 1.0) * F.log(F.col(g)) - b * F.col(g)
        )
        terms.append(F.when(F.col(g) == 0, F.lit(float(p0))).otherwise(dens_pos))
    return reduce(lambda x, y: x * y, terms)


def cpar_fit_aggs(gamma_cols: list[str], prefix: str,
                  where: Column | None = None) -> list[Column]:
    """Sufficient statistics per variable for the hurdle-Gamma fit:
    p0 = mean(γ==0) (A2), n⁺, Σγ⁺, Σlog γ⁺ for the Choi–Wette Newton solve
    (A4), mean(γ⁺) (A3). ``where`` restricts the fit set null-safely (see
    binary_fit_aggs) so sides fuse into one pass."""
    aggs: list[Column] = []
    for g in gamma_cols:
        c = F.when(where, F.col(g)) if where is not None else F.col(g)
        pos = F.when(c > 0, c)
        aggs += [
            F.avg((c == 0).cast("double")).alias(f"{prefix}_p0_{g}"),
            F.count(pos).alias(f"{prefix}_npos_{g}"),
            F.sum(pos).alias(f"{prefix}_sum_{g}"),
            F.sum(F.log(pos)).alias(f"{prefix}_sumlog_{g}"),
        ]
    return aggs


def cpar_params_from_row(
    row: dict, gamma_cols: list[str], prefix: str, fallback_beta: list[float] | None = None
) -> tuple[list[float], list[float], list[float]]:
    """Turn the aggregate row into (p_0, alpha, beta) per variable.

    beta = α / mean(γ⁺); NaN beta (no positive gammas) falls back to the
    previous value (reference ``beta_M[is.nan(beta_M)] <- beta_M_old``,
    unsupervised_learning.R:572-574)."""
    p_0, alpha, beta = [], [], []
    for i, g in enumerate(gamma_cols):
        p0 = float(row[f"{prefix}_p0_{g}"])
        n_pos = int(row[f"{prefix}_npos_{g}"] or 0)
        s = row[f"{prefix}_sum_{g}"]
        sl = row[f"{prefix}_sumlog_{g}"]
        if n_pos >= 2:
            a = gamma_shape_newton(n_pos, float(s), float(sl))
            b = a / (float(s) / n_pos)
        elif n_pos == 1:
            # Degenerate: single positive observation. Keep alpha=1 (the
            # solver's start), mean = the observation.
            a = 1.0
            b = a / float(s)
        else:
            a = 1.0
            b = fallback_beta[i] if fallback_beta is not None else float("nan")
        p_0.append(p0)
        alpha.append(a)
        beta.append(b)
    return p_0, alpha, beta


# ------------------------------------------------------------- posteriors ---

def g_est_expr(n_M: float, n: float, ratio_col: str = "ratio") -> Column:
    """ĝ = min( n_M·r / (n_M·(r−1) + n), 1 ) (A9,
    unsupervised_learning.R:492)."""
    r = F.col(ratio_col)
    return F.least(F.lit(1.0), n_M * r / (n_M * (r - 1.0) + F.lit(float(n))))


def drop_constant_variables(
    A: DataFrame, B: DataFrame, variables: list[str]
) -> tuple[list[str], list[str]]:
    """Constant-key-variable elimination (reference
    ``drop_constant_key_variables`` internals.R:223-255): a variable with one
    distinct value across A ∪ B carries no signal. One distributed agg pass.

    Returns (kept_variables, dropped_variables)."""
    union = A.select(*variables).unionByName(B.select(*variables))
    counts = union.agg(
        *[F.count_distinct(F.col(v)).alias(v) for v in variables]
    ).collect()[0]
    kept = [v for v in variables if counts[v] > 1]
    dropped = [v for v in variables if counts[v] <= 1]
    return kept, dropped
