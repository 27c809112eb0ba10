"""Closure-correction kernel goldens: the pure kernel vs an independent
explicit-loop reimplementation of the reference math, the closed-form min-norm
projection vs pinv(A), and the distributed operator vs the single-threaded
oracle (exact)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from covsar_spark.functions.stats import chi2_sf
from covsar_spark.operators.closure import design_matrix
from covsar_spark.operators.closure_correct import (
    closure_correct,
    correct_span,
    corrected_pairs,
    min_norm_errors,
    span_stats,
)

RNG = np.random.default_rng(7)


def _golden(v: np.ndarray) -> dict:
    """Independent, explicit-loop recomputation of correct_span (the 'direct
    numpy computation' golden — no shared code paths beyond design_matrix)."""
    n = len(v)
    A, pairs, trips = design_matrix(n)
    ivals = 10 * np.log10(v + 1.0)
    phi = np.array([np.cbrt(v[i] - v[j]) for i, j in pairs])
    c = np.array(
        [
            np.cbrt(v[i] - v[j]) + np.cbrt(v[j] - v[k]) - np.cbrt(v[i] - v[k])
            for i, j, k in trips
        ]
    )
    amp = np.array([(ivals[i] - ivals[j]) - (ivals[j] - ivals[k]) for i, j, k in trips])
    slope = np.cov(amp, c, bias=True)[0, 1] / amp.var()
    intercept = c.mean() - slope * amp.mean()
    est = intercept + slope * amp
    phi_err = np.linalg.pinv(A) @ est
    phi_corr = phi - phi_err
    sd = [pairs.index((t, t + 1)) for t in range(n - 1)]
    drift = np.cumsum(phi_corr[sd]) - np.cumsum(phi[sd])
    x = np.arange(n - 1, dtype=float)
    bias = np.polyfit(x, drift, 1)[0]
    adj = [r for r, (i, j, k) in enumerate(trips) if j == i + 1 and k == j + 1]
    e_raw = np.linalg.pinv(A) @ (A @ phi)
    sigma2 = np.sum(e_raw**2) / max(len(pairs) - (n - 1), 1)
    A_adj = A[adj]
    s_stat = c[adj] @ np.linalg.inv(sigma2 * (A_adj @ A_adj.T)) @ c[adj]
    pval = float(chi2_sf(s_stat, (n - 1) * (n - 2) / 2.0))
    return {
        "phi": phi, "phi_err": phi_err, "phi_corr": phi_corr, "slope": slope,
        "intercept": intercept, "bias": bias, "chi2_s": s_stat, "pval": pval,
        "rmse": np.sqrt(np.mean((est - c) ** 2)),
        "drift_rms": np.sqrt(np.mean(drift**2)),
    }


def test_min_norm_matches_pinv():
    for n in (3, 5, 8, 12, 20):
        A, _, _ = design_matrix(n)
        phi = RNG.normal(0, 2, A.shape[1])
        want = np.linalg.pinv(A) @ (A @ phi)
        got = min_norm_errors(phi, n)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)
        # inversion is exactly consistent: A e reproduces the closures
        np.testing.assert_allclose(A @ got, A @ phi, rtol=0, atol=1e-9)


def test_closure_identity_three_epochs():
    # hand-checkable N=3 (covsar/least_norm.py:23-27): one triplet,
    # closure = phi01 + phi12 - phi02
    v = np.array([10.0, 3.0, 7.0])
    res = correct_span(v)
    phi = res["phi"]
    want = np.cbrt(7.0) + np.cbrt(-4.0) - np.cbrt(3.0)
    got = phi[0] + phi[2] - phi[1]  # pairs order (0,1),(0,2),(1,2)
    assert abs(got - want) < 1e-12


@pytest.mark.parametrize("n", [4, 7, 10, 20])
def test_kernel_vs_explicit_golden(n):
    v = RNG.integers(1, 1000, n).astype(float)
    res = correct_span(v)
    g = _golden(v)
    for k in ("phi", "phi_err", "phi_corr"):
        np.testing.assert_allclose(res[k], g[k], rtol=1e-10, atol=1e-10)
    for k in ("slope", "intercept", "rmse", "drift_rms", "bias", "chi2_s", "pval"):
        assert abs(res[k] - g[k]) < 1e-8, (k, res[k], g[k])


def test_batch_matches_single():
    from covsar_spark.operators.closure_correct import correct_span_batch

    series = [RNG.integers(1, 1000, n).astype(float) for n in (4, 7, 20, 20, 10, 2, 7)]
    batch = correct_span_batch(series)
    for s, res in zip(series, batch):
        single = correct_span(s)
        assert res["n_epochs"] == single["n_epochs"]
        for k in ("phi", "phi_err", "phi_corr"):
            np.testing.assert_allclose(res[k], single[k], rtol=1e-9, atol=1e-12, err_msg=k)
        for k in ("r", "slope", "intercept", "rmse", "drift_rms", "bias", "chi2_s", "pval"):
            assert abs(res[k] - single[k]) < 1e-8, (k, res[k], single[k])


def test_consistent_series_needs_no_correction():
    # a constant series has zero pair differences -> zero closures -> the
    # fitted correction is exactly zero and pval = 1 (nothing to explain)
    res = correct_span(np.full(10, 42.0))
    assert np.all(res["phi"] == 0) and np.all(res["phi_err"] == 0)
    assert res["pval"] == 1.0 and res["chi2_s"] == 0.0


def test_degenerate_short_spans():
    for n in (0, 1, 2):
        res = correct_span(np.arange(n, dtype=float))
        assert res["n_epochs"] == n and len(res["phi"]) == 0


def _synthetic_rollup(spark, n_sources=6, epochs=240):
    rows = []
    for s in range(n_sources):
        for t in range(epochs):
            # deterministic gappy series
            if (t * 7 + s) % 11 == 0:
                continue
            rows.append((f"src-{s}", 60 * t, int((t * 37 + s * 101) % 997) + 1))
    pdf = pd.DataFrame(rows, columns=["source", "epoch_s", "token_count"])
    return spark.createDataFrame(pdf), pdf


def test_spark_matches_oracle_exact(spark):
    from covsar_spark.oracle import closure_stats

    sdf, pdf = _synthetic_rollup(spark)
    k = closure_correct(sdf, "1m")  # span 3600 -> up to 60 epochs, capped 20
    got = span_stats(k).toPandas().sort_values(["source", "span_s"]).reset_index(drop=True)
    want = closure_stats(pdf, "1m")[list(got.columns)]
    want = want.sort_values(["source", "span_s"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            # the Spark kernel runs the BATCHED gemm form (and worker BLAS is
            # pinned single-thread); the driver oracle is per-span — equal up
            # to BLAS summation order
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(), rtol=1e-9, atol=1e-9, err_msg=c
            )
        else:
            assert (got[c] == want[c]).all(), c


def test_corrected_pairs_shape(spark):
    sdf, _ = _synthetic_rollup(spark, n_sources=2, epochs=40)
    pr = corrected_pairs(closure_correct(sdf, "1m")).toPandas()
    # every span with n epochs contributes C(n,2) pairs
    st = span_stats(closure_correct(sdf, "1m")).toPandas()
    want = int(sum(n * (n - 1) // 2 for n in st["n_epochs"]))
    assert len(pr) == want
    assert (pr["i"] < pr["j"]).all()
    np.testing.assert_allclose(
        pr["phi_corr"], pr["phi"] - pr["phi_err"], rtol=0, atol=1e-12
    )


def test_relational_invert_matches_pinv(spark):
    from covsar_spark.operators.closure import closure_invert_relational

    sdf, pdf = _synthetic_rollup(spark, n_sources=3, epochs=60)
    got = (
        closure_invert_relational(sdf, span_s=600, max_epochs=10)
        .toPandas()
        .sort_values(["source", "span_s", "i", "j"])
        .reset_index(drop=True)
    )
    rows = []
    d = pdf.assign(span_s=(pdf["epoch_s"] // 600) * 600)
    for (src, sp), g in d.groupby(["source", "span_s"], sort=True):
        v = g.sort_values("epoch_s")["token_count"].to_numpy(np.float64)[:10]
        n = len(v)
        if n < 2:
            continue
        A, pairs, _ = design_matrix(n)
        phi = np.array([np.cbrt(v[i] - v[j]) for i, j in pairs])
        err = np.linalg.pinv(A) @ (A @ phi)
        for (i, j), p, e in zip(pairs, phi, err):
            rows.append((src, sp, i, j, round(p, 6), round(e, 6), round(p - e, 6)))
    want = pd.DataFrame(
        rows, columns=["source", "span_s", "i", "j", "phi", "err", "consistent"]
    ).sort_values(["source", "span_s", "i", "j"]).reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["phi"], want["phi"], atol=1e-9)
    np.testing.assert_allclose(got["err"], want["err"], atol=1e-6)
    np.testing.assert_allclose(got["consistent"], want["consistent"], atol=1e-6)
