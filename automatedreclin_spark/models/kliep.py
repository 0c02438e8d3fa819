"""KLIEP density-ratio estimation for the continuous_nonparametric family.

Direct importance estimation by Kullback-Leibler Importance Estimation
Procedure (Sugiyama et al., NIPS 2007 / Ann. Inst. Stat. Math. 2008): model
r(γ) = Σ_l α_l K_σ(γ, c_l), maximize Σ_i log r(x_i) over numerator samples
subject to mean_j r(y_j) = 1 over denominator samples and α ≥ 0, with σ
chosen by K-fold likelihood cross-validation.

The reference wraps densityratio::kliep per variable on the POSITIVE gammas
only, with the hurdle mass term handled separately (``fit_kliep_hurdle_models``
internals.R:309-320, ``kliep_hurdle_ratio`` internals.R:406-421).

Spark split: the numerator sample (match side) is small by construction
(≤ min(n_A, n_B)); the denominator sample is capped (documented deviation —
the reference uses all of U, which is single-node-feasible only). The FIT is
driver-side numpy; SCORING is an Arrow-batched pandas UDF with the tiny
(centers, α, σ) model broadcast in the closure.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@dataclass
class KliepControl:
    """Parity knobs mirroring the reference's ``control_kliep``
    (controls.R:19-25) plus this package's own defaults.

    - ``nfold``: likelihood-CV folds for the sigma grid. The reference
      defaults to 2 (densityratio::kliep via control_kliep); this package
      has used 5 since round 1 — pass ``nfold=2`` for reference behavior.
    - ``scale``: None | "numerator" | "denominator" — standardize inputs by
      that side's mean/sd before fitting (controls.R `scale`); the model
      stores (mu, sd) so scoring applies the same transform.
    - ``centers``: "quantile" (deterministic numerator quantile grid, repo
      default — reproducible across runs) or "numerator" (numerator points
      as kernel centers, densityratio's behavior, taken as a deterministic
      stride subsample instead of a random one).
    - ``n_centers`` / ``sigmas``: kernel-center budget and explicit sigma
      grid (None → data-driven spread grid).

    ``nfold`` / ``n_centers`` / ``sigmas`` default to None = "inherit the
    explicit :func:`fit_kliep` keyword argument" — a control that only sets
    e.g. ``scale`` must not silently override a caller's ``n_centers=50``.
    """

    nfold: int | None = None
    n_centers: int | None = None
    sigmas: list[float] | None = None
    centers: str = "quantile"
    scale: str | None = None


@dataclass
class KliepModel:
    centers: np.ndarray   # (L,)
    alpha: np.ndarray     # (L,)
    sigma: float
    mu: float = 0.0       # input standardization (KliepControl.scale)
    sd: float = 1.0

    def predict(self, x: np.ndarray) -> np.ndarray:
        z = (np.asarray(x, dtype=np.float64) - self.mu) / self.sd
        k = np.exp(-((z[:, None] - self.centers[None, :]) ** 2) / (2 * self.sigma**2))
        return k @ self.alpha


def _fit_alpha(A: np.ndarray, b: np.ndarray, max_iter: int = 200, tol: float = 1e-6) -> np.ndarray:
    """KLIEP inner loop: projected gradient ascent on Σ log(Aα) with the
    constraints b'α = 1, α ≥ 0 (Sugiyama 2008, Fig. 2)."""
    L = A.shape[1]
    alpha = np.full(L, 1.0 / max(b.sum(), 1e-300))
    bb = b @ b
    eps_grid = [1.0, 0.1, 0.01, 0.001]
    prev_obj = -np.inf
    for _ in range(max_iter):
        r = A @ alpha
        r = np.maximum(r, 1e-300)
        for eps in eps_grid:
            cand = alpha + eps * (A.T @ (1.0 / r)) / A.shape[0]
            cand = cand + (1.0 - b @ cand) * b / bb
            cand = np.maximum(0.0, cand)
            s = b @ cand
            if s <= 0:
                continue
            cand = cand / s
            obj = np.log(np.maximum(A @ cand, 1e-300)).sum()
            if obj > prev_obj:
                alpha = cand
                break
        else:
            break
        if obj - prev_obj < tol * max(1.0, abs(prev_obj)):
            prev_obj = obj
            break
        prev_obj = obj
    return alpha


def fit_kliep(
    x_numerator: np.ndarray,
    x_denominator: np.ndarray,
    n_centers: int = 100,
    sigmas: list[float] | None = None,
    n_folds: int = 5,
    seed: int = 1,
    control: KliepControl | None = None,
) -> KliepModel:
    """Univariate KLIEP fit with likelihood CV over a sigma grid. Default
    centers are deterministic numerator quantiles (the reference samples; we
    trade exact parity for reproducibility, which the driver's F1 check
    allows); pass ``control=KliepControl(nfold=2, centers="numerator")`` for
    reference-default behavior (control_kliep, controls.R:19-25)."""
    if control is not None:
        # None fields inherit the explicit kwargs (set fields win).
        n_centers = control.n_centers if control.n_centers is not None else n_centers
        sigmas = control.sigmas if control.sigmas is not None else sigmas
        n_folds = control.nfold if control.nfold is not None else n_folds
    x_num = np.asarray(x_numerator, dtype=np.float64)
    x_den = np.asarray(x_denominator, dtype=np.float64)
    if len(x_num) < 2 or len(x_den) < 2:
        raise ValueError("KLIEP needs at least two positive comparisons per side.")

    mu, sd = 0.0, 1.0
    if control is not None and control.scale is not None:
        side = x_num if control.scale == "numerator" else x_den
        mu = float(side.mean())
        sd = float(side.std()) or 1.0
        x_num = (x_num - mu) / sd
        x_den = (x_den - mu) / sd

    L = min(n_centers, len(x_num))
    if control is not None and control.centers == "numerator":
        # densityratio behavior: numerator points as kernel centers (here a
        # deterministic stride subsample rather than a random one).
        step = max(1, len(x_num) // L)
        centers = x_num[::step][:L]
    else:
        centers = np.quantile(x_num, np.linspace(0, 1, L))

    if sigmas is None:
        spread = np.subtract(*np.percentile(np.concatenate([x_num, x_den]), [90, 10]))
        base = max(float(spread), 1e-3)
        sigmas = [base * f for f in (0.1, 0.25, 0.5, 1.0, 2.0)]

    def kernel(x: np.ndarray, sigma: float) -> np.ndarray:
        return np.exp(-((x[:, None] - centers[None, :]) ** 2) / (2 * sigma**2))

    rng = np.random.default_rng(seed)
    folds = rng.integers(0, n_folds, size=len(x_num))

    best_sigma, best_score = sigmas[0], -np.inf
    for sigma in sigmas:
        K_den = kernel(x_den, sigma)
        b = K_den.mean(axis=0)
        if not np.all(np.isfinite(b)) or b.sum() <= 0:
            continue
        score = 0.0
        ok = True
        for f in range(n_folds):
            tr = x_num[folds != f]
            te = x_num[folds == f]
            if len(tr) < 1 or len(te) < 1:
                continue
            alpha = _fit_alpha(kernel(tr, sigma), b)
            r_te = kernel(te, sigma) @ alpha
            if np.any(r_te <= 0):
                ok = False
                break
            score += np.log(r_te).mean()
        if ok and score > best_score:
            best_score, best_sigma = score, sigma

    K_den = kernel(x_den, best_sigma)
    alpha = _fit_alpha(kernel(x_num, best_sigma), K_den.mean(axis=0))
    return KliepModel(centers=centers, alpha=alpha, sigma=best_sigma, mu=mu, sd=sd)


def kliep_positive_udf(model: KliepModel) -> Column:
    """Vectorized scorer r⁺(γ) for positive gammas: one (batch × L) kernel
    matmul per Arrow batch (``predict_kliep_positive`` internals.R:328-340)."""
    centers = model.centers
    alpha = model.alpha
    sigma = model.sigma
    mu, sd = model.mu, model.sd

    @pandas_udf("double")
    def _score(g: pd.Series) -> pd.Series:
        x = (g.to_numpy(dtype=np.float64) - mu) / sd
        k = np.exp(-((x[:, None] - centers[None, :]) ** 2) / (2 * sigma**2))
        return pd.Series(k @ alpha)

    return _score


def kliep_hurdle_ratio_expr(
    gamma_cols: list[str],
    p_0_num: list[float],
    p_0_den: list[float],
    models: dict[str, KliepModel | None],
) -> Column:
    """Per-row hurdle KLIEP ratio, product over variables
    (``kliep_hurdle_ratio`` internals.R:406-421):
        γ=0 → p0_num/p0_den ;  γ>0 → (1−p0_num)/(1−p0_den) · r⁺(γ)
    Variables without a model use only the mass term."""
    from functools import reduce

    terms = []
    for i, g in enumerate(gamma_cols):
        mass0 = float(p_0_num[i]) / float(p_0_den[i]) if p_0_den[i] else float("inf")
        mass_pos = (
            (1.0 - float(p_0_num[i])) / (1.0 - float(p_0_den[i]))
            if p_0_den[i] < 1.0 else float("inf")
        )
        model = models.get(g)
        if model is not None:
            pos = F.lit(mass_pos) * kliep_positive_udf(model)(F.col(g))
        else:
            pos = F.lit(1.0)
        terms.append(F.when(F.col(g) == 0, F.lit(mass0)).otherwise(pos))
    return reduce(lambda x, y: x * y, terms)


def _hash_capped(base, cap: int, seed: int):
    """Partition-independent driver downsample: order by xxhash64 of the pair
    id (a, b) and take the first ``cap`` rows. ``sample().limit()`` depends on
    the physical partitioning (different rows at local[8] vs local[32]); an
    orderBy-hash prefix is the same row set at any parallelism, and Spark
    executes it as per-partition top-K (TakeOrderedAndProject), never a full
    sort of the input."""
    if "a" in base.columns and "b" in base.columns:
        key = F.xxhash64(F.col("a"), F.col("b"), F.lit(seed))
    else:  # no pair ids — hash every column (still partition-independent)
        key = F.xxhash64(*[F.col(c) for c in base.columns], F.lit(seed))
    return base.orderBy(key.asc(), *base.columns).limit(cap)


def collect_positive_gammas(
    df, gamma_col: str, cap: int = 20_000, seed: int = 1
) -> np.ndarray:
    """Collect positive gammas to the driver, down-sampling past ``cap``
    (hash-deterministic — same rows at any partitioning). The match side is
    small by construction; the cap guards the denominator side at scale."""
    cols = [c for c in ("a", "b") if c in df.columns] + [gamma_col]
    base = df.select(*cols).filter(F.col(gamma_col) > 0)
    n = base.count()
    if n > cap:
        base = _hash_capped(base, cap, seed)
    return base.toPandas()[gamma_col].to_numpy(dtype=np.float64)


@dataclass
class KliepModelMulti:
    centers: np.ndarray   # (L, K)
    alpha: np.ndarray     # (L,)
    sigma: float

    def predict(self, x: np.ndarray) -> np.ndarray:
        d2 = ((x[:, None, :] - self.centers[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / (2 * self.sigma**2)) @ self.alpha


def fit_kliep_multi(
    x_numerator: np.ndarray,
    x_denominator: np.ndarray,
    n_centers: int = 100,
    sigmas: list[float] | None = None,
    n_folds: int = 5,
    seed: int = 1,
) -> KliepModelMulti:
    """Multivariate KLIEP (the reference's ``nonpar_hurdle = FALSE`` path:
    densityratio::kliep on the FULL K-dim comparison vectors,
    unsupervised_learning.R:632-641). Same objective as the univariate fit
    with K-dim Gaussian kernels; centers = deterministic numerator subsample.
    """
    x_num = np.atleast_2d(np.asarray(x_numerator, dtype=np.float64))
    x_den = np.atleast_2d(np.asarray(x_denominator, dtype=np.float64))
    if x_num.shape[0] < 2 or x_den.shape[0] < 2:
        raise ValueError("KLIEP needs at least two samples per side.")

    L = min(n_centers, x_num.shape[0])
    step = max(1, x_num.shape[0] // L)
    centers = x_num[::step][:L]

    if sigmas is None:
        both = np.vstack([x_num, x_den])
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(both), size=min(200, len(both)), replace=False)
        d = np.sqrt(((both[idx, None, :] - both[None, idx, :]) ** 2).sum(-1))
        med = float(np.median(d[d > 0])) if (d > 0).any() else 1.0
        sigmas = [med * f for f in (0.25, 0.5, 1.0, 2.0)]

    def kernel(x: np.ndarray, sigma: float) -> np.ndarray:
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / (2 * sigma**2))

    rng = np.random.default_rng(seed)
    folds = rng.integers(0, n_folds, size=x_num.shape[0])
    best_sigma, best_score = sigmas[0], -np.inf
    for sigma in sigmas:
        b = kernel(x_den, sigma).mean(axis=0)
        if not np.all(np.isfinite(b)) or b.sum() <= 0:
            continue
        score, ok = 0.0, True
        for f in range(n_folds):
            tr, te = x_num[folds != f], x_num[folds == f]
            if len(tr) < 1 or len(te) < 1:
                continue
            alpha = _fit_alpha(kernel(tr, sigma), b)
            r = kernel(te, sigma) @ alpha
            if np.any(r <= 0):
                ok = False
                break
            score += np.log(r).mean()
        if ok and score > best_score:
            best_score, best_sigma = score, sigma

    alpha = _fit_alpha(kernel(x_num, best_sigma), kernel(x_den, best_sigma).mean(axis=0))
    return KliepModelMulti(centers=centers, alpha=alpha, sigma=best_sigma)


def kliep_multi_udf(model: KliepModelMulti, gamma_cols: list[str]) -> Column:
    """Vectorized multivariate ratio scorer over the K gamma columns."""
    centers, alpha, sigma = model.centers, model.alpha, model.sigma

    @pandas_udf("double")
    def _score(*cols: pd.Series) -> pd.Series:
        x = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.exp(-d2 / (2 * sigma**2)) @ alpha)

    return _score(*[F.col(g) for g in gamma_cols])


def collect_gamma_matrix(df, gamma_cols: list[str], cap: int = 20_000, seed: int = 1) -> np.ndarray:
    """Collect the full K-dim gamma rows to the driver (hash-deterministic
    capped sample — same rows at any partitioning)."""
    id_cols = [c for c in ("a", "b") if c in df.columns]
    base = df.select(*id_cols, *gamma_cols)
    n = base.count()
    if n > cap:
        base = _hash_capped(base, cap, seed)
    return base.toPandas()[gamma_cols].to_numpy(dtype=np.float64)
