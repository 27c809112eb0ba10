"""chi2 CDF (functions/stats.py) vs exact closed forms — scipy-free goldens.

For even dof k = 2m the survival function has the exact closed form
  sf(x, 2m) = exp(-x/2) * sum_{i=0}^{m-1} (x/2)^i / i!
and chi2.cdf(x, 2) = 1 - exp(-x/2). These pin the incomplete-gamma
implementation across both the series (x < a+1) and continued-fraction
(x >= a+1) branches.
"""

from __future__ import annotations

import math

import numpy as np

from covsar_spark.functions.stats import chi2_cdf, chi2_sf, gammainc_p


def _sf_even(x: float, k: int) -> float:
    m = k // 2
    h = x / 2.0
    return math.exp(-h) * sum(h**i / math.factorial(i) for i in range(m))


def test_even_dof_closed_form():
    for k in (2, 4, 10, 36, 90):
        for x in (0.1, 1.0, k / 2, float(k), 2.0 * k, 5.0 * k):
            got = float(chi2_sf(x, k))
            want = _sf_even(x, k)
            assert abs(got - want) < 1e-11, (k, x, got, want)


def test_known_identities():
    # cdf(x, 2) = 1 - e^{-x/2}
    assert abs(float(chi2_cdf(2.0, 2)) - (1 - math.exp(-1))) < 1e-13
    # cdf(3, 4) = 1 - e^{-1.5}(1 + 1.5)
    assert abs(float(chi2_cdf(3.0, 4)) - (1 - math.exp(-1.5) * 2.5)) < 1e-13
    # P(a, 0) = 0, P(a, inf-ish) = 1
    assert float(gammainc_p(3.0, 0.0)) == 0.0
    assert abs(float(gammainc_p(3.0, 1e4)) - 1.0) < 1e-14


def test_odd_dof_sane_and_monotone():
    # dof=1: cdf(x,1) = erf(sqrt(x/2))
    for x in (0.5, 1.0, 4.0):
        assert abs(float(chi2_cdf(x, 1)) - math.erf(math.sqrt(x / 2.0))) < 1e-11
    xs = np.linspace(0.01, 60, 200)
    cdf = chi2_cdf(xs, 7)
    assert np.all(np.diff(cdf) > 0)
    assert 0 < cdf[0] < cdf[-1] < 1


def test_vectorized_broadcast():
    x = np.array([1.0, 5.0, 20.0])
    out = chi2_cdf(x, 6)
    assert out.shape == (3,)
    for i, xi in enumerate(x):
        assert abs(out[i] - (1 - _sf_even(xi, 6))) < 1e-12
