"""Property-based invariants (hypothesis) over the pure kernels — the
formalization of the reference's simulation-as-oracle methodology
(SURVEY.md §5): codec round-trips on arbitrary inputs, closure-inversion
consistency, rollup/cascade additivity, eigen-kernel invariants, chi2 CDF
shape. No Spark session needed — these pin the math the engine distributes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from covsar_spark.functions.stats import chi2_cdf
from covsar_spark.operators.closure import design_matrix
from covsar_spark.operators.closure_correct import correct_span, min_norm_errors
from covsar_spark.operators.codecs import decode_dod, decode_xor, encode_dod, encode_xor
from covsar_spark.operators.eigen import lagcov_eig

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_dod_roundtrip_any_monotonic_timestamps(deltas):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) + 1_700_000_000
    blob = encode_dod(ts)
    np.testing.assert_array_equal(decode_dod(blob, len(ts)), ts)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=300))
def test_xor_roundtrip_any_doubles(vals):
    v = np.asarray(vals, dtype=np.float64)
    blob = encode_xor(v)
    out = decode_xor(blob, len(v))
    # bit-exact round trip (including -0.0)
    np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))


def test_xor_roundtrip_special_bit_patterns():
    v = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, -1e308])
    out = decode_xor(encode_xor(v), len(v))
    np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=3, max_value=12),
    st.integers(min_value=0, max_value=2**31),
)
def test_inversion_reproduces_closures(n, seed):
    """A e == A phi for the least-norm inversion e (the closure identity the
    reference hand-checks at covsar/least_norm.py:23-27), and the residual
    phi - e is consistent (all its closures vanish)."""
    A, _, _ = design_matrix(n)
    phi = np.random.default_rng(seed).normal(0, 3, A.shape[1])
    e = min_norm_errors(phi, n)
    np.testing.assert_allclose(A @ e, A @ phi, atol=1e-9)
    np.testing.assert_allclose(A @ (phi - e), 0.0, atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=3, max_size=20),
)
def test_correct_span_invariants(vals):
    res = correct_span(np.asarray(vals, dtype=np.float64))
    n = res["n_epochs"]
    A, _, _ = design_matrix(n)
    # corrected pairs = pairs minus errors, elementwise
    np.testing.assert_allclose(res["phi_corr"], res["phi"] - res["phi_err"], atol=0)
    # fit quality bounded
    assert -1.0 - 1e-12 <= res["r"] <= 1.0 + 1e-12
    assert res["rmse"] >= 0 and res["drift_rms"] >= 0
    assert 0.0 <= res["pval"] <= 1.0
    # the correction lies in the row space of A: its null-space component
    # vanishes (theta-projection of phi_err is phi_err itself)
    e = res["phi_err"]
    np.testing.assert_allclose(min_norm_errors(e, n), e, atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=64),
)
def test_lagcov_eig_invariants(vals):
    x = np.asarray(vals, dtype=np.float64)
    lam, tc, v = lagcov_eig(x)
    assert lam >= -1e-9
    assert -1e-12 <= tc <= 1.0 + 1e-12
    if len(v):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-9)
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if nz.size:
            assert v[nz[0]] > 0  # gauge: first non-tiny element positive


def test_lagcov_eig_rank_one_recovers_direction():
    # reference fact (covsar/closure_inten.py:591-595): the dominant eigvec
    # of v v^T is v (up to gauge) — plant a constant series: Gram is rank-1
    x = np.full(32, 7.0)
    lam, tc, v = lagcov_eig(x)
    assert tc > 0.999
    np.testing.assert_allclose(v, np.full(len(v), 1.0 / np.sqrt(len(v))), atol=1e-9)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=86400 * 3 - 1),  # epoch offset
            st.integers(min_value=1, max_value=1000),  # n_tok
            st.integers(min_value=0, max_value=3),  # source id
        ),
        min_size=1,
        max_size=200,
    )
)
def test_rollup_cascade_additivity(rows):
    """1m -> 1h cascade equals a direct 1h rollup exactly (integral sums) —
    the relook re-aggregation law (covsar/covariance.py:48-61)."""
    import pandas as pd

    from covsar_spark.oracle import cascade, rollup

    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(rows))],
            "n_tok": [r[1] for r in rows],
            "source": [f"s{r[2]}" for r in rows],
            "epoch_s": [1_700_000_000 + r[0] for r in rows],
        }
    )
    m1 = rollup(df, "1m")
    via_cascade = cascade(m1, "1h").set_index(["source", "epoch_s"])
    direct = rollup(df, "1h").set_index(["source", "epoch_s"])
    assert via_cascade["token_count"].equals(direct["token_count"])
    assert via_cascade["n_docs"].equals(direct["n_docs"])
    assert via_cascade["max_tok"].equals(direct["max_tok"])


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=0.01, max_value=500.0), st.integers(min_value=1, max_value=80))
def test_chi2_cdf_shape(x, k):
    c = float(chi2_cdf(x, k))
    assert 0.0 <= c <= 1.0
    # monotone in x, anti-monotone in dof
    assert float(chi2_cdf(x * 1.5, k)) >= c - 1e-12
    assert float(chi2_cdf(x, k + 2)) <= c + 1e-12


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**31),
)
def test_emi_invariants(p, seed):
    """EMI linker invariants on arbitrary PSD Grams: unit-norm eigenvector,
    gauge-positive first significant element, lam_min real and ~>= its
    theoretical floor 0 for PSD-weighted forms, and EXACT bottom-eigenpair
    residual of |C|^-1 ∘ C."""
    from covsar_spark.operators.eigen import emi_link

    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (p, 4 * p))
    G = X @ X.T / (4 * p)
    lam, tc, v = emi_link(G)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if nz.size:
        assert v[nz[0]] > 0
    assert 0.0 <= tc <= 1.0 + 1e-9
    d = np.sqrt(np.diag(G))
    C = G / np.outer(d, d)
    M = np.linalg.inv(np.abs(C)) * C
    w = np.linalg.eigvalsh(M)
    assert abs(lam - w[0]) < 1e-6 * max(1.0, abs(w[0]))
