"""Eigen kernel math on planted fixtures (FIXTURES.md F3) + batch/single
bit-equivalence + end-to-end Spark vs oracle exactness."""

from __future__ import annotations

import numpy as np

from covsar_spark import oracle
from covsar_spark.datagen import gen_planted
from covsar_spark.operators.eigen import eigen_rollup, lagcov_eig, lagcov_eig_batch
from covsar_spark.operators.gapfill import gapfill
from covsar_spark.operators.rollup import rollup_tokens, with_event_time

from .conftest import cols_to_spark


def test_gram_is_psd_and_symmetric():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.normal(0, 1, rng.integers(2, 100))
        lam, tc, v = lagcov_eig(x)
        assert lam >= -1e-12
        assert 0.0 <= tc <= 1.0 + 1e-12
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_rank1_recovery_exact_structure():
    """For a constant-amplitude (rank-1 trajectory) series, the dominant mode
    carries all the energy — the property CovSAR relies on at
    closure_inten.py:591-595."""
    x = np.full(64, 3.0)
    lam, tc, v = lagcov_eig(x, p=8)
    assert abs(tc - 1.0) < 1e-12
    # eigvec of the all-ones rank-1 Gram is uniform with positive gauge
    assert np.allclose(v, np.full(8, 1 / np.sqrt(8)), atol=1e-12)
    assert v[0] > 0


def test_planted_signal_recovered():
    """Planted smooth signal + small noise: leading eigenvector ~ the lag
    embedding of the signal; tc stays high."""
    src, ts, val = gen_planted(n_sources=2, p=64)
    for s in ("planted-0", "planted-1"):
        x = val[src == s]
        lam, tc, v = lagcov_eig(x, p=8)
        assert tc > 0.9
        assert v[0] > 0


def test_zero_series_deterministic():
    lam, tc, v = lagcov_eig(np.zeros(16), p=8)
    assert lam == 0.0 and tc == 0.0
    assert len(v) == 8


def test_short_series_shrinks_lag_dim():
    lam, tc, v = lagcov_eig(np.array([1.0, 2.0, 3.0]), p=8)
    assert len(v) == 3
    lam, tc, v = lagcov_eig(np.array([], dtype=float), p=8)
    assert len(v) == 0


def test_batch_equals_single_bitwise():
    """lagcov_eig_batch (the engine path) must agree with lagcov_eig (the
    oracle path) bit-for-bit — guards the exact-match gate."""
    rng = np.random.default_rng(1)
    series = [rng.integers(0, 1000, n).astype(float) for n in (60, 60, 24, 60, 7, 24)]
    batch = lagcov_eig_batch(series)
    for s, (blam, btc, bv) in zip(series, batch):
        lam, tc, v = lagcov_eig(s)
        assert lam == blam and tc == btc
        assert np.array_equal(v, bv)


def test_eigen_rollup_matches_oracle(spark, tiny_cols):
    df = with_event_time(cols_to_spark(spark, tiny_cols))
    filled = gapfill(rollup_tokens(df, "1m"), "1m", "zero")
    got = eigen_rollup(filled, "1m").toPandas()
    ofilled = oracle.gapfill(oracle.rollup(oracle.tokens_frame(tiny_cols), "1m"), "1m", "zero")
    exp = oracle.eigen(ofilled, "1m")
    got = got.sort_values(["source", "span_s"], kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(["source", "span_s"], kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["source"] == exp["source"]).all()
    assert np.array_equal(got["span_s"].to_numpy(), exp["span_s"].to_numpy())
    assert np.array_equal(got["n_epochs"].to_numpy(), exp["n_epochs"].to_numpy())
    assert np.array_equal(got["lam"].to_numpy(), exp["lam"].to_numpy()), "lam not bit-identical"
    assert np.array_equal(got["tc"].to_numpy(), exp["tc"].to_numpy())
    for a, b in zip(got["eig"], exp["eig"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
