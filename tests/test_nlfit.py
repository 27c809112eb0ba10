"""Nonlinear closure-model fit kernel (reference estimate_s:
covsar/regression/nl_phase.py:37-86): planted recovery, batch==single,
independent per-series loop oracle, and the Spark rollup plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd

from covsar_spark.operators.nlfit import nl_fit_stack, nl_phase_fit, nlfit_rollup


def _loop_oracle(ph, x, s0=0.0, rnge=2.0, grid_n=5, maxi=50, tol=1e-3):
    """Straight transcription of the reference equations, one series at a
    time: grid argmin of the L1 wrapped residual, then GN with J = x."""
    grid = np.linspace(s0 - rnge, s0 + rnge, grid_n)
    l1 = [np.abs(np.angle(np.exp(1j * s * x) * np.conj(ph))).sum() for s in grid]
    m = grid[int(np.argmin(l1))]
    s_grid = m
    xx = float(x @ x)
    n_iter = 0
    if xx > 1e-12:
        for _ in range(maxi):
            r = np.angle(np.exp(1j * m * x) * np.conj(ph))
            m_new = m - float(x @ r) / xx
            n_iter += 1
            if abs(m_new) > 1e-12 and abs((m_new - m) / m_new) < tol:
                # reference grad_descent returns the 0-based loop index at
                # convergence (updates - 1); maxi when the loop exhausts
                n_iter -= 1
                m = m_new
                break
            m = m_new
    r = np.angle(np.exp(1j * m * x) * np.conj(ph))
    return s_grid, m, n_iter, float(np.abs(r).sum())


def _simulate(rng, n=20, s=1.32, sigma=0.3):
    """Reference simulate() shape (nl_phase.py:88-105): pairwise intensity
    differences + planted frequency s + phase noise."""
    sm = rng.normal(30, 2, n)
    x = (np.subtract.outer(sm, sm)).flatten()
    ph = np.exp(1j * (x * s + rng.normal(0, sigma, x.shape)))
    return ph, x


def test_planted_recovery_and_noise():
    rng = np.random.default_rng(11)
    ph, x = _simulate(rng, s=1.32, sigma=0.0)
    _, s_fit, _, resid = nl_phase_fit(ph, x)
    assert abs(s_fit - 1.32) < 1e-6  # noiseless: exact recovery
    assert resid < 1e-6
    ph, x = _simulate(rng, s=1.32, sigma=0.5)
    _, s_noisy, _, _ = nl_phase_fit(ph, x)
    assert abs(s_noisy - 1.32) < 0.05


def test_batch_equals_single_equals_loop_oracle():
    rng = np.random.default_rng(7)
    series = []
    for s in (0.4, -1.1, 1.9, 0.0):
        ph, x = _simulate(rng, n=12, s=s, sigma=0.4)
        series.append((ph, x))
    PH = np.stack([p for p, _ in series])
    X = np.stack([x for _, x in series])
    sg_b, sf_b, ni_b, rl_b = nl_fit_stack(PH, X)
    for b, (ph, x) in enumerate(series):
        sg1, sf1, ni1, rl1 = nl_phase_fit(ph, x)
        sgo, sfo, nio, rlo = _loop_oracle(ph, x)
        assert sg_b[b] == sg1 == sgo
        np.testing.assert_allclose([sf_b[b], sf1], sfo, rtol=0, atol=1e-12)
        assert ni_b[b] == ni1 == nio
        np.testing.assert_allclose([rl_b[b], rl1], rlo, rtol=0, atol=1e-9)


def test_constant_intensity_keeps_grid():
    """x == 0 everywhere (J^T J = 0): the fit must keep the grid argmin and
    report zero GN updates instead of dividing by zero."""
    ph = np.exp(1j * np.full(10, 0.3))
    x = np.zeros(10)
    s_grid, s_fit, n_iter, _ = nl_phase_fit(ph, x)
    assert s_fit == s_grid
    assert n_iter == 0


def test_nlfit_rollup_spark(spark):
    """Spark plumbing: spans fit in one shuffle; values equal the kernel run
    directly on the same per-span series."""
    n_src, n_ep = 3, 8
    rows = []
    rng = np.random.default_rng(5)
    for s in range(n_src):
        for t in range(n_ep):
            rows.append((f"s{s}", 60 * t, float(rng.integers(1, 500))))
    pdf = pd.DataFrame(rows, columns=["source", "epoch_s", "token_count"])
    roll = spark.createDataFrame(pdf)
    got = nlfit_rollup(roll, "1m").toPandas().set_index("source").sort_index()
    assert len(got) == n_src
    for s in range(n_src):
        v = pdf[pdf["source"] == f"s{s}"].sort_values("epoch_s")["token_count"].to_numpy()
        ii, jj = np.triu_indices(len(v), 1)
        x = 10.0 * (np.log10(v[ii] + 1.0) - np.log10(v[jj] + 1.0))
        ph = np.exp(1j * np.cbrt(v[ii] - v[jj]))
        _, s_fit, _, _ = nl_phase_fit(ph, x)
        assert abs(got.loc[f"s{s}", "s_fit"] - s_fit) < 1e-12
        assert got.loc[f"s{s}", "n_pairs"] == len(ii)
