"""Distributed parametric bootstrap (reference bootstrap.R, §2.9)."""

import numpy as np
import pytest

from automatedreclin_spark.fixtures import name_examples
from automatedreclin_spark.models.bootstrap import est_se_bootstrap, mec_relaxed_np
from automatedreclin_spark.models.mec import mec


def test_mec_relaxed_np_recovers_planted_count():
    rng = np.random.default_rng(0)
    n, n_M = 1000, 100
    g = np.zeros(n); g[:n_M] = 1; rng.shuffle(g)
    theta = np.array([0.95, 0.9]); eta = np.array([0.05, 0.1])
    probs = np.where(g[:, None] == 1, theta, eta)
    omega_b = (rng.random((n, 2)) < probs).astype(float)
    est = mec_relaxed_np(omega_b, None, n, n_M, theta, None, None, None)
    assert est == pytest.approx(n_M, rel=0.4)


def test_bootstrap_binary_mec(spark):
    A, B, _ = name_examples(spark)
    fit = mec(A, B, variables=["name", "surname"])
    res = est_se_bootstrap(spark, fit, B=32, seed=3)
    assert res.se > 0
    assert res.ci_normal[0] < fit.n_M_est < res.ci_normal[1]
    assert len(res.boot_dist) == 32
    # determinism across reruns
    res2 = est_se_bootstrap(spark, fit, B=32, seed=3)
    assert np.allclose(res.boot_dist, res2.boot_dist)
