"""Hit-miss value-frequency model (the reference's fourth method family).

Per variable: a value-domain table with m_d = frequency of value d in A; an
EM over B's observed values estimating the nonmatch value distribution u_d
and per-row posterior δ_b; then η is recomputed from Σ u·m and Σ m²
(``unsupervised_learning.R:460-486, 647-746``).

Spark split: the value tables are one groupBy per variable (domains are
small categorical dims by construction — this method models discrete
agreement); B's value codes are collected to the driver and the EM runs
vectorized in numpy (the reference itself excludes hit_miss from the blocked
scale path, unsupervised_learning.R:1002-1006 — it is a small/medium-data
method). Scoring stays distributed: θ/η feed the same Bernoulli column
expressions as the binary family.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: driver-side EM guard: |B| × K value codes collected to the driver.
MAX_B_ROWS_FOR_EM = 5_000_000


@dataclass
class HitMissValueModel:
    variable: str
    values: np.ndarray        # domain values (as strings)
    m_est: np.ndarray         # P(value | A)
    b_codes: np.ndarray       # B rows coded into the domain (int32)


def fit_value_models(
    A: DataFrame, B: DataFrame, variables: list[str]
) -> dict[str, HitMissValueModel]:
    """Value-domain tables: values = unique(A ∪ B) per variable,
    m_d = freq of d in A (unsupervised_learning.R:476-486). One groupBy per
    variable + a coded collect of B."""
    n_B = B.count()
    if n_B > MAX_B_ROWS_FOR_EM:
        raise ValueError(
            f"hit_miss EM collects B value codes to the driver; |B|={n_B} exceeds "
            f"{MAX_B_ROWS_FOR_EM}. Use the binary method at this scale (the "
            "reference also excludes hit_miss from the blocked path)."
        )
    n_A = A.count()
    models = {}
    b_pdf = B.select(*variables).toPandas()
    for v in variables:
        a_counts = (
            A.groupBy(F.col(v).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .toPandas()
        )
        b_vals = b_pdf[v].astype(str)
        domain = list(dict.fromkeys(list(a_counts["value"]) + list(b_vals.unique())))
        idx = {d: i for i, d in enumerate(domain)}
        m = np.zeros(len(domain))
        for val, cnt in zip(a_counts["value"], a_counts["cnt"]):
            m[idx[val]] = cnt / n_A
        codes = b_vals.map(idx).to_numpy(dtype=np.int64)
        models[v] = HitMissValueModel(
            variable=v, values=np.array(domain, dtype=object), m_est=m, b_codes=codes
        )
    return models


def hit_miss_em(
    models: dict[str, HitMissValueModel],
    p_est: float,
    rng: np.random.Generator,
    max_iter_em: int = 10,
    tol_em: float = 1.0,
) -> dict[str, np.ndarray]:
    """EM for the nonmatch value distributions u (vectorized numpy replica of
    unsupervised_learning.R:647-746): random-init u, posterior
    δ_b = p·m_b/(p·m_b + (1−p)·u_b), u_d ← Σ_b(1−δ_b)1[z_b=d]/Σ_b(1−δ_b),
    log-likelihood convergence with tolerance ``tol_em``."""
    variables = list(models)
    u = {}
    for v in variables:
        init = rng.uniform(0, 1, len(models[v].m_est))
        u[v] = init / init.sum()

    # m_b product per B row (constant across EM iterations).
    m_bk_prod = np.ones(len(next(iter(models.values())).b_codes))
    for v in variables:
        m_bk_prod *= models[v].m_est[models[v].b_codes]

    log_lik_old = None
    delta_old = None
    for it in range(1, max_iter_em + 2):
        u_bk_prod = np.ones_like(m_bk_prod)
        for v in variables:
            u_bk_prod *= u[v][models[v].b_codes]
        denom = p_est * m_bk_prod + (1 - p_est) * u_bk_prod
        with np.errstate(divide="ignore", invalid="ignore"):
            delta_b = np.where(denom > 0, p_est * m_bk_prod / denom, 0.0)

        if it >= 2:
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = np.where(delta_old == 0, 0.0,
                              delta_old * np.log(np.maximum(p_est * m_bk_prod, 1e-300)))
                t2 = np.where(u_bk_prod == 0, 0.0,
                              (1 - delta_old) * np.log(np.maximum((1 - p_est) * u_bk_prod, 1e-300)))
            log_lik = float(t1.sum() + t2.sum())
            if it >= 3 and abs(log_lik - log_lik_old) <= tol_em:
                break
            log_lik_old = log_lik

        w = 1.0 - delta_b
        w_sum = w.sum()
        for v in variables:
            u_new = np.bincount(models[v].b_codes, weights=w,
                                minlength=len(u[v]))
            u[v] = u_new / w_sum if w_sum > 0 else u[v]
        delta_old = delta_b
    return u


def hit_miss_eta(
    models: dict[str, HitMissValueModel],
    u: dict[str, np.ndarray],
    p_est: float,
    n_A: int,
) -> dict[str, float]:
    """η_k = [(1−p)·Σ u·m + p(1−1/n_A)·Σ m²] / (1 − p/n_A)
    (unsupervised_learning.R:735-742)."""
    out = {}
    for v, mdl in models.items():
        num = (1 - p_est) * float(u[v] @ mdl.m_est) + p_est * (1 - 1 / n_A) * float(
            mdl.m_est @ mdl.m_est
        )
        out[v] = num / (1 - p_est / n_A)
    return out
