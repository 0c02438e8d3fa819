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


def _str_value(v: str):
    """Value coded as string with NULL → 'None' — the same sentinel pandas
    ``astype(str)`` produces in the numpy path, so domains sort cleanly and
    null join keys still hit the value tables in the distributed EM."""
    return F.coalesce(F.col(v).cast("string"), F.lit("None"))


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
            A.groupBy(_str_value(v).alias("value"))
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


# ---------------------------------------------------------------------------
# Distributed EM — the scale path past MAX_B_ROWS_FOR_EM.
# ---------------------------------------------------------------------------

def fit_value_domains(A: DataFrame, B: DataFrame, variables: list[str]):
    """Per-variable value-domain tables WITHOUT collecting B's row codes:
    (value, m) pandas frames (domains are small categorical dims by the
    method's construction — only the |B| ROW table is huge). Returns
    (domains, n_A)."""
    import pandas as pd

    n_A = A.count()
    domains: dict[str, pd.DataFrame] = {}
    for v in variables:
        a_counts = (
            A.groupBy(_str_value(v).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .toPandas()
        )
        b_vals = (
            B.select(_str_value(v).alias("value")).distinct().toPandas()
        )
        # sorted domain: collect order of a distributed groupBy is partition-
        # dependent, and the EM's random init is assigned positionally
        dom = sorted(dict.fromkeys(list(a_counts["value"]) + list(b_vals["value"])))
        m = pd.Series(0.0, index=dom)
        m.loc[a_counts["value"]] = a_counts["cnt"].to_numpy() / n_A
        domains[v] = pd.DataFrame({"value": dom, "m": m.to_numpy()})
    return domains, n_A


def hit_miss_em_spark(
    B: DataFrame,
    variables: list[str],
    domains: dict,
    p_est: float,
    rng: np.random.Generator,
    max_iter_em: int = 10,
    tol_em: float = 1.0,
) -> dict[str, np.ndarray]:
    """The same EM as :func:`hit_miss_em`, but the per-row work (δ_b
    posteriors, Σ(1−δ)·1[z=d] scatter) runs IN SPARK — per iteration:
    K broadcast joins of the tiny (value, u) tables against B plus one
    groupBy per variable. B is never collected; the only driver state is the
    domain-sized u vectors. Exactly the SURVEY §2 A12 "EM as joins against
    per-variable value tables" shape; float results match the numpy EM to
    summation-order (tested at 1e-9).

    The constant per-row m-product is computed once and persisted; u lookups
    are re-broadcast each iteration (domain-sized, trivially small)."""
    import pandas as pd
    from pyspark.storagelevel import StorageLevel

    spark = B.sparkSession
    u: dict[str, np.ndarray] = {}
    for v in variables:
        init = rng.uniform(0, 1, len(domains[v]))
        u[v] = init / init.sum()

    base = B.select(*[_str_value(v).alias(f"z_{v}") for v in variables])
    m_prod = F.lit(1.0)
    for v in variables:
        mdf = spark.createDataFrame(
            domains[v].rename(columns={"value": f"z_{v}", "m": f"m_{v}"}))
        base = base.join(F.broadcast(mdf), f"z_{v}", "left") \
                   .withColumn(f"m_{v}", F.coalesce(f"m_{v}", F.lit(0.0)))
        m_prod = m_prod * F.col(f"m_{v}")
    base = base.withColumn("m_prod", m_prod) \
               .select(*[f"z_{v}" for v in variables], "m_prod") \
               .persist(StorageLevel.MEMORY_AND_DISK)

    log_lik_old = None
    have_delta_old = False
    for it in range(1, max_iter_em + 2):
        cur = base
        u_prod = F.lit(1.0)
        for v in variables:
            udf_ = spark.createDataFrame(pd.DataFrame({
                f"z_{v}": domains[v]["value"], f"u_{v}": u[v]}))
            cur = cur.join(F.broadcast(udf_), f"z_{v}", "left") \
                     .withColumn(f"u_{v}", F.coalesce(f"u_{v}", F.lit(0.0)))
            u_prod = u_prod * F.col(f"u_{v}")
        denom = p_est * F.col("m_prod") + (1 - p_est) * u_prod
        cur = cur.withColumn("u_prod", u_prod).withColumn(
            "delta", F.when(denom > 0, p_est * F.col("m_prod") / denom).otherwise(0.0)
        ).withColumn("w", 1.0 - F.col("delta"))

        if have_delta_old:
            # log-lik uses the PREVIOUS delta against the CURRENT u-product —
            # mirror the numpy loop exactly (delta_old is a deterministic
            # function of the previous u, so recompute it in-plan).
            ll = cur.agg(
                F.sum(
                    F.when(F.col("delta_prev") == 0, 0.0).otherwise(
                        F.col("delta_prev")
                        * F.log(F.greatest(p_est * F.col("m_prod"), F.lit(1e-300))))
                    + F.when(F.col("u_prod") == 0, 0.0).otherwise(
                        (1.0 - F.col("delta_prev"))
                        * F.log(F.greatest((1 - p_est) * F.col("u_prod"), F.lit(1e-300))))
                ).alias("ll"),
            ).collect()[0]["ll"]
            log_lik = float(ll)
            if it >= 3 and abs(log_lik - log_lik_old) <= tol_em:
                break
            log_lik_old = log_lik

        aggs = [F.sum("w").alias("_w_sum")]
        scatter = cur.agg(*aggs).collect()[0]
        w_sum = float(scatter["_w_sum"])
        for v in variables:
            counts = (
                cur.groupBy(f"z_{v}").agg(F.sum("w").alias("w")).toPandas()
                .set_index(f"z_{v}")["w"]
            )
            u_new = counts.reindex(domains[v]["value"]).fillna(0.0).to_numpy()
            u[v] = u_new / w_sum if w_sum > 0 else u[v]

        # materialize this iteration's delta as delta_prev for the next
        # iteration's log-likelihood (mirrors the numpy loop's delta_old)
        have_delta_old = True
        prev = cur.select(*[f"z_{v}" for v in variables], "m_prod",
                          F.col("delta").alias("delta_prev"))
        old_base = base
        base = prev.persist(StorageLevel.MEMORY_AND_DISK)
        base.count()
        old_base.unpersist()
    base.unpersist()
    return u
