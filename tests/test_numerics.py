import math

import numpy as np
import pytest

from automatedreclin_spark.functions.numerics import (
    digamma,
    gamma_shape_newton,
    trigamma,
)


def test_digamma_known_values():
    assert digamma(1.0) == pytest.approx(-0.5772156649015329, abs=1e-12)
    assert digamma(0.5) == pytest.approx(-1.9635100260214235, abs=1e-12)
    assert digamma(10.0) == pytest.approx(2.2517525890667214, abs=1e-12)


def test_trigamma_known_values():
    assert trigamma(1.0) == pytest.approx(math.pi**2 / 6, abs=1e-12)
    assert trigamma(0.5) == pytest.approx(math.pi**2 / 2, abs=1e-12)


def test_gamma_shape_newton_is_exact_root():
    rng = np.random.default_rng(0)
    x = rng.gamma(shape=5.0, scale=2.0, size=100_000)
    a = gamma_shape_newton(len(x), float(x.sum()), float(np.log(x).sum()))
    assert a == pytest.approx(5.0, rel=0.02)
    # root property: f(a) ~ 0
    n = len(x)
    mean = x.mean()
    f = float(np.log(x).sum() - n * np.log(mean) - n * digamma(a) + n * np.log(a))
    assert abs(f) < 1e-6


def test_gamma_shape_newton_guard():
    with pytest.raises(ValueError):
        gamma_shape_newton(1, 1.0, 0.0)
