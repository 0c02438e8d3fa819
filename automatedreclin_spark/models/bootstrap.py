"""Parametric bootstrap for the MEC match-count estimate (reference
bootstrap.R:8-286, unexported WIP there — here a first-class distributed op).

Each replicate: simulate g ~ permutation of round(n_M) ones; draw gammas from
the fitted Bernoulli / hurdle-Gamma parameters; rerun the RELAXED MEC
(same fixed-point loop but top-n_M head instead of one-to-one dedup,
``mec_relaxed`` bootstrap.R:116-286); collect the n_M distribution → SE +
normal/percentile CIs.

Replicates are embarrassingly parallel: ``spark.range(B)`` fanned out one
task per replicate via mapInPandas, each task running the pure-numpy
replicate end-to-end (an Ω replicate is n rows × K gamma doubles — bounded by
the unblocked-MEC scale this estimator applies to). Per-replicate RNG is
seeded by (seed, replicate_id) — deterministic across partitionings.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from automatedreclin_spark.functions.numerics import gamma_shape_newton


@dataclass
class BootstrapResult:
    se: float
    ci_normal: tuple[float, float]
    ci_percentile: tuple[float, float]
    boot_dist: np.ndarray
    n_M_original: float
    B: int
    alpha: float


def _bernoulli_product(g: np.ndarray, probs: np.ndarray) -> np.ndarray:
    out = np.ones(g.shape[0])
    for k in range(g.shape[1]):
        p = probs[k]
        out *= np.where(g[:, k] == 1, p, 1 - p)
    return out


def _hurdle_gamma_product(x: np.ndarray, p0: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.ones(x.shape[0])
    for k in range(x.shape[1]):
        xk = x[:, k]
        log_c = a[k] * math.log(b[k]) - math.lgamma(a[k])
        with np.errstate(divide="ignore", invalid="ignore"):
            dens = (1 - p0[k]) * np.exp(log_c + (a[k] - 1) * np.log(np.maximum(xk, 1e-300)) - b[k] * xk)
        out *= np.where(xk == 0, p0[k], dens)
    return out


def _fit_gamma_cols(x: np.ndarray, fallback_beta: np.ndarray | None = None):
    p0 = (x == 0).mean(axis=0)
    alphas, betas = [], []
    for k in range(x.shape[1]):
        pos = x[:, k][x[:, k] > 0]
        if len(pos) >= 2:
            a = gamma_shape_newton(len(pos), float(pos.sum()), float(np.log(pos).sum()))
            b = a / pos.mean()
        else:
            a = 1.0
            b = fallback_beta[k] if fallback_beta is not None else np.nan
        alphas.append(a)
        betas.append(b)
    return p0, np.array(alphas), np.array(betas)


def mec_relaxed_np(
    omega_b: np.ndarray | None,
    omega_cpar: np.ndarray | None,
    n: int,
    n_M_est: int,
    theta: np.ndarray | None,
    p_0_M: np.ndarray | None,
    alpha_M: np.ndarray | None,
    beta_M: np.ndarray | None,
    delta: float = 0.5,
    eps: float = 0.05,
    max_iter: int = 1000,
) -> float:
    """Pure-numpy relaxed MEC on a simulated Ω replicate
    (bootstrap.R:116-286): top-round(n_M) head by ratio, no one-to-one."""
    ratio = np.ones(n)
    if omega_b is not None:
        eta = omega_b.mean(axis=0)
        ratio *= _bernoulli_product(omega_b, theta) / _bernoulli_product(omega_b, eta)
        b_denom = _bernoulli_product(omega_b, eta)
    if omega_cpar is not None:
        p_0_U, alpha_U, beta_U = _fit_gamma_cols(omega_cpar)
        cpar_denom = _hurdle_gamma_product(omega_cpar, p_0_U, alpha_U, beta_U)
        ratio *= _hurdle_gamma_product(omega_cpar, p_0_M, alpha_M, beta_M) / cpar_denom

    th, p0m, am, bm = theta, p_0_M, alpha_M, beta_M
    th_old = p0m_old = am_old = bm_old = None
    n_M_prev_count = n_M_est
    n_M = float(n_M_est)
    for it in range(1, max_iter + 1):
        with np.errstate(divide="ignore", invalid="ignore"):
            g_est = np.minimum(
                n_M_prev_count * ratio / (n_M_prev_count * (ratio - 1) + n), 1.0
            )
        n_M_old = n_M if it > 1 else float(n_M_est)
        n_M = float(np.nansum(g_est))
        order = np.argsort(-ratio, kind="stable")
        m_idx = order[: int(round(n_M))]
        if len(m_idx) == 0:
            break
        n_M_prev_count = len(m_idx)

        if it >= 2:
            old = np.concatenate([v for v in (th_old, p0m_old, am_old, bm_old) if v is not None])
            new = np.concatenate([v for v in (th, p0m, am, bm) if v is not None])
            if abs(n_M_old - n_M) < delta or np.linalg.norm(old - new) < eps:
                break

        ratio = np.ones(n)
        if omega_b is not None:
            th_old = th.copy()
            th = omega_b[m_idx].mean(axis=0)
            ratio *= _bernoulli_product(omega_b, th) / b_denom
        if omega_cpar is not None:
            p0m_old, am_old, bm_old = p0m.copy(), am.copy(), bm.copy()
            p0m, am, bm = _fit_gamma_cols(omega_cpar[m_idx], fallback_beta=bm_old)
            bm = np.where(np.isnan(bm), bm_old, bm)
            ratio *= _hurdle_gamma_product(omega_cpar, p0m, am, bm) / cpar_denom
    return n_M


def est_se_bootstrap(
    spark: SparkSession,
    mec_result,
    B: int = 100,
    alpha: float = 0.05,
    seed: int = 1,
) -> BootstrapResult:
    """Distributed parametric bootstrap over a fitted MecResult (binary and/or
    continuous_parametric families; cnonpar/hit_miss unsupported, like the
    reference)."""
    n = int(mec_result.n)
    n_M_original = float(mec_result.n_M_est)
    n_M_est = int(round(n_M_original))
    bp = mec_result.b_params
    cp = mec_result.cpar_params
    theta = bp["theta"].to_numpy() if bp is not None else None
    eta = bp["eta"].to_numpy() if bp is not None else None
    p_0_M = cp["p_0_M"].to_numpy() if cp is not None else None
    alpha_M = cp["alpha_M"].to_numpy() if cp is not None else None
    beta_M = cp["beta_M"].to_numpy() if cp is not None else None
    p_0_U = cp["p_0_U"].to_numpy() if cp is not None else None
    alpha_U = cp["alpha_U"].to_numpy() if cp is not None else None
    beta_U = cp["beta_U"].to_numpy() if cp is not None else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rep in pdf["id"]:
                rng = np.random.default_rng((seed, int(rep)))
                g = np.zeros(n, dtype=np.int8)
                g[:n_M_est] = 1
                rng.shuffle(g)
                omega_b = omega_cpar = None
                if theta is not None:
                    probs = np.where(g[:, None] == 1, theta[None, :], eta[None, :])
                    omega_b = (rng.random((n, len(theta))) < probs).astype(np.float64)
                if p_0_M is not None:
                    K = len(p_0_M)
                    p0v = np.where(g[:, None] == 1, p_0_M[None, :], p_0_U[None, :])
                    av = np.where(g[:, None] == 1, alpha_M[None, :], alpha_U[None, :])
                    bv = np.where(g[:, None] == 1, beta_M[None, :], beta_U[None, :])
                    pos = rng.random((n, K)) < (1 - p0v)
                    vals = rng.gamma(shape=av, scale=1.0 / bv)
                    omega_cpar = np.where(pos, vals, 0.0)
                n_M_b = mec_relaxed_np(
                    omega_b, omega_cpar, n, n_M_est,
                    theta, p_0_M, alpha_M, beta_M,
                )
                out.append({"rep": int(rep), "n_M": n_M_b})
            yield pd.DataFrame(out)

    boot = (
        spark.range(B).repartition(min(B, spark.sparkContext.defaultParallelism * 2))
        .mapInPandas(run, schema="rep long, n_M double")
        .toPandas()
        .sort_values("rep")
    )
    dist = boot["n_M"].to_numpy()
    se = float(np.sqrt(((dist - n_M_original) ** 2).sum() / (B - 1)))
    # normal quantile without scipy: inverse error function via numpy polyfit
    # is overkill — use the Acklam/Moro-style approximation via
    # numpy.percentile on a standard normal? Simpler: use math.erf inverse by
    # bisection (z in [0, 10], monotone).
    from math import erf

    def qnorm(p: float) -> float:
        lo, hi = -10.0, 10.0
        while hi - lo > 1e-10:
            mid = (lo + hi) / 2
            if (1 + erf(mid / math.sqrt(2))) / 2 < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    z = qnorm(1 - alpha / 2)
    ci_normal = (n_M_original - z * se, n_M_original + z * se)
    ci_percentile = (
        float(np.quantile(dist, alpha / 2)),
        float(np.quantile(dist, 1 - alpha / 2)),
    )
    return BootstrapResult(
        se=se, ci_normal=ci_normal, ci_percentile=ci_percentile,
        boot_dist=dist, n_M_original=n_M_original, B=B, alpha=alpha,
    )
