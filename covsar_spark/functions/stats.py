"""Statistical special functions needed by the closure-significance operator
(covsar/closures.py:130-141 uses scipy.stats.chi2.cdf; scipy is not available
here, so the chi-squared CDF is computed from the regularized lower incomplete
gamma function P(a, x) with the textbook series / continued-fraction pair —
vectorized numpy, no per-row Python).

chi2.cdf(x, k) == P(k/2, x/2).

Accuracy: |err| < 1e-11 over the tested domain (validated in
tests/test_stats.py against the closed-form even-dof survival function
1 - exp(-x/2) * sum_{i<k/2} (x/2)^i / i! and hand-checkable identities like
chi2.cdf(2, 2) = 1 - e^-1).
"""

from __future__ import annotations

import numpy as np

_MAX_ITER = 300
_EPS = 3e-14
_TINY = 1e-300


def _gammainc_p_series(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Lower regularized incomplete gamma via its power series (x < a + 1)."""
    ap = a.copy()
    term = np.full_like(x, 1.0) / np.maximum(a, _TINY)
    total = term.copy()
    for _ in range(_MAX_ITER):
        ap = ap + 1.0
        term = term * x / ap
        total = total + term
        if np.all(np.abs(term) < np.abs(total) * _EPS):
            break
    log_pref = a * np.log(np.maximum(x, _TINY)) - x - _lgamma(a)
    return total * np.exp(log_pref)


def _gammainc_q_contfrac(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Upper regularized incomplete gamma via Lentz continued fraction
    (x >= a + 1)."""
    b = x + 1.0 - a
    c = np.full_like(x, 1.0 / _TINY)
    d = 1.0 / np.maximum(b, _TINY)
    h = d.copy()
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b = b + 2.0
        d = an * d + b
        d = np.where(np.abs(d) < _TINY, _TINY, d)
        c = b + an / c
        c = np.where(np.abs(c) < _TINY, _TINY, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    log_pref = a * np.log(np.maximum(x, _TINY)) - x - _lgamma(a)
    return np.exp(log_pref) * h


def _lgamma(a: np.ndarray) -> np.ndarray:
    # numpy has no vectorized lgamma outside scipy; Lanczos approximation
    # (g=7, n=9 coefficients — classic public constants, |rel err| < 1e-13)
    g = 7.0
    coef = np.array(
        [
            0.99999999999980993,
            676.5203681218851,
            -1259.1392167224028,
            771.32342877765313,
            -176.61502916214059,
            12.507343278686905,
            -0.13857109526572012,
            9.9843695780195716e-6,
            1.5056327351493116e-7,
        ]
    )
    a = np.asarray(a, dtype=np.float64)
    z = a - 1.0
    x = np.full_like(z, coef[0])
    for i in range(1, 9):
        x = x + coef[i] / (z + i)
    t = z + g + 0.5
    return 0.5 * np.log(2.0 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(x)


def gammainc_p(a, x) -> np.ndarray:
    """Regularized lower incomplete gamma P(a, x), vectorized."""
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    a, x = np.broadcast_arrays(a, x)
    out = np.zeros(a.shape, dtype=np.float64)
    pos = x > 0
    ser = pos & (x < a + 1.0)
    cf = pos & ~ser
    if ser.any():
        out[ser] = _gammainc_p_series(a[ser], x[ser])
    if cf.any():
        out[cf] = 1.0 - _gammainc_q_contfrac(a[cf], x[cf])
    return np.clip(out, 0.0, 1.0)


def gammainc_q(a, x) -> np.ndarray:
    """Regularized UPPER incomplete gamma Q(a, x) = 1 - P(a, x), computed
    DIRECTLY: in the tail (x >= a+1) the continued fraction already yields Q
    to full precision, so routing through P would destroy sub-1e-16 tails
    (1 - (1 - Q) collapses p-values below ~2e-16 to exactly 0; round-4
    review — scipy.stats.chi2.sf keeps them)."""
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    a, x = np.broadcast_arrays(a, x)
    out = np.ones(a.shape, dtype=np.float64)
    pos = x > 0
    ser = pos & (x < a + 1.0)
    cf = pos & ~ser
    if ser.any():
        out[ser] = 1.0 - _gammainc_p_series(a[ser], x[ser])
    if cf.any():
        out[cf] = _gammainc_q_contfrac(a[cf], x[cf])
    return np.clip(out, 0.0, 1.0)


def chi2_cdf(x, df) -> np.ndarray:
    """chi-squared CDF (scipy.stats.chi2.cdf replacement,
    covsar/closures.py:141)."""
    return gammainc_p(np.asarray(df, dtype=np.float64) / 2.0, np.asarray(x, dtype=np.float64) / 2.0)


def chi2_sf(x, df) -> np.ndarray:
    """Survival function Q(df/2, x/2) — the reference's p-value
    (covsar/closures.py:141). Computed via the direct upper-gamma path so
    deep-tail p-values (chi2 ~ 80 at 3 dof -> ~3e-17) survive instead of
    rounding to 0.0 through 1 - cdf."""
    return gammainc_q(np.asarray(df, dtype=np.float64) / 2.0, np.asarray(x, dtype=np.float64) / 2.0)
