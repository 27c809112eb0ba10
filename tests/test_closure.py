"""Closure/triplet operator tests, incl. the analytic 3-epoch least-norm
example the reference hand-checks (covsar/least_norm.py:23-27)."""

from __future__ import annotations

import numpy as np

from covsar_spark.operators.closure import (
    closure_regression,
    consecutive_triplets,
    design_matrix,
    epoch_pairs,
    invert_closures,
)


def test_design_matrix_shapes():
    for n in (3, 5, 8):
        A, pairs, trips = design_matrix(n)
        assert A.shape == (len(trips), len(pairs))
        assert len(pairs) == n * (n - 1) // 2
        # every triplet row: +1, +1, -1
        assert np.array_equal(np.sort(A, axis=1)[:, -2:], np.ones((len(trips), 2)))
        assert (A.sum(axis=1) == 1.0).all()


def test_closure_identity_consistent_phases():
    """If pair errors derive from per-epoch phases e_ij = p_i - p_j, every
    closure is exactly zero (the closure identity, covsar/closures.py:295-300)."""
    n = 5
    A, pairs, _ = design_matrix(n)
    rng = np.random.default_rng(3)
    p = rng.normal(0, 1, n)
    e = np.array([p[i] - p[j] for i, j in pairs])
    assert np.allclose(A @ e, 0.0, atol=1e-12)


def test_least_norm_3epoch_analytic():
    """n=3: one triplet, closure c = e01 + e12 - e02 -> least-norm errors
    (c/3, -c/3, c/3) in lex pair order (e01, e02, e12) — the reference's
    hand-checkable example, covsar/least_norm.py:23-27."""
    e = invert_closures(np.array([0.9]), 3)
    assert np.allclose(e, [0.3, -0.3, 0.3], atol=1e-12)
    # A e reproduces the closure
    A, _, _ = design_matrix(3)
    assert np.allclose(A @ e, [0.9], atol=1e-12)


def test_invert_closures_reproduces_range():
    n = 6
    A, pairs, _ = design_matrix(n)
    rng = np.random.default_rng(4)
    true_e = rng.normal(0, 1, len(pairs))
    c = A @ true_e
    e = invert_closures(c, n)
    assert np.allclose(A @ e, c, atol=1e-10)  # consistent
    assert np.linalg.norm(e) <= np.linalg.norm(true_e) + 1e-10  # least-norm


def test_pairs_and_triplets_relational(spark, tiny_cols):
    from covsar_spark.operators.rollup import rollup_tokens, with_event_time
    from .conftest import cols_to_spark

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    pairs = epoch_pairs(roll, "1h", max_lag=2).toPandas()
    assert (pairs["lag"].isin([1, 2])).all()
    assert (pairs["e_j"] > pairs["e_i"]).all()
    trips = consecutive_triplets(roll, "1h").toPandas()
    # verify one triplet by hand against the rollup
    rp = roll.toPandas().set_index(["source", "epoch_s"])["token_count"]
    for _, r in trips.head(5).iterrows():
        vi = rp[(r["source"], r["e_i"])]
        vj = rp[(r["source"], r["e_i"] + 3600)]
        vk = rp[(r["source"], r["e_i"] + 7200)]
        assert r["closure"] == vi - 2 * vj + vk
    reg = closure_regression(consecutive_triplets(roll, "1h")).toPandas()
    assert (reg["n_triplets"] > 0).all()
