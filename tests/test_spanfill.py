"""In-kernel zero-fill (operators/spanfill) == relational gapfill + kernel.

The r9 optimization feeds the span kernels (closure correction, eigen,
nonlinear fit, chunk compression) the RAW sparse rollup and zero-fills each
span's dense grid inside the kernel (sentinel prep) instead of
materializing the dense calendar grid relationally first. These tests pin
the obligation from the module docstring on a gappy multi-source rollup
with off-span-boundary ranges: grids, counts, and codec blobs bit-for-bit;
gemm-fed floats to 1e-9 (see _assert_equal for why the last ulp can move);
and the ROUNDED declared contract outputs bit-for-bit on real data.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from covsar_spark.operators.gapfill import gapfill

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def sparse_rollup(spark):
    """Gappy 1m rollup: 3 sources, ranges starting/ending off span
    boundaries, ~35% of minutes observed, deterministic values."""
    rows = []
    for s, (start_min, n_min, keep_mod) in {
        "a": (7, 700, 3),      # starts mid-span, 1/3 observed
        "b": (130, 260, 2),    # different lattice offset
        "c": (1441, 60, 1),    # fully dense source
    }.items():
        for k in range(n_min):
            if k % keep_mod:
                continue
            e = (start_min + k) * 60
            tok = (k * 37 + (ord(s) * 13) % 101) % 997 + 1
            rows.append((s, e, tok, 1, tok, tok, round(tok / 60.0, 6), False))
    return spark.createDataFrame(
        rows,
        "source string, epoch_s long, token_count long, n_docs long, "
        "max_tok int, min_tok int, rate double, filled boolean",
    )


def _collect(df, sort_cols):
    rows = df.orderBy(*sort_cols).collect()
    return [tuple(r) for r in rows]


def _assert_equal(old, new, float_tol=0.0):
    """float_tol=0 -> bitwise. The gemm-fed kernels (closure, eigen, nlfit)
    get float_tol=1e-9 (the repo's existing batch-vs-single pin,
    tests/test_closure_correct.py): their batched BLAS results wiggle in
    the last ulp with the BATCH SIZE, and the in-kernel-fill path groups
    spans by Arrow batch instead of by 64-span bucket, so the same class
    of last-ulp wiggle appears. Every declared query output rounds to
    >= 4dp, far above 1e-9's reach on O(1) values; the rounded contract
    outputs are additionally pinned identical in
    test_contract_outputs_identical below."""
    assert len(old) == len(new)
    for ro, rn in zip(old, new):
        assert len(ro) == len(rn)
        for a, b in zip(ro, rn):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if float_tol and a != b:
                    assert abs(a - b) <= float_tol * max(1.0, abs(a)), (ro, rn)
                else:
                    assert math.copysign(1.0, a) == math.copysign(1.0, b) and a == b, (ro, rn)
            elif isinstance(a, list):
                ax, bx = np.asarray(a), np.asarray(b)
                if float_tol and ax.dtype.kind == "f":
                    np.testing.assert_allclose(ax, bx, rtol=float_tol, atol=1e-12)
                else:
                    np.testing.assert_array_equal(ax, bx)
            else:
                assert a == b, (ro, rn)


def test_closure_correct_fill_equals_relational(sparse_rollup):
    from covsar_spark.operators.closure_correct import closure_correct

    filled = gapfill(sparse_rollup, "1m", "zero")
    old = _collect(closure_correct(filled, "1m"), ["source", "span_s"])
    new = _collect(closure_correct(sparse_rollup, "1m", fill="zero"), ["source", "span_s"])
    _assert_equal(old, new, float_tol=1e-9)


def test_closure_correct_fill_stats_only(sparse_rollup):
    from covsar_spark.operators.closure_correct import closure_correct

    filled = gapfill(sparse_rollup, "1m", "zero")
    old = _collect(closure_correct(filled, "1m", emit_pairs=False), ["source", "span_s"])
    new = _collect(
        closure_correct(sparse_rollup, "1m", emit_pairs=False, fill="zero"),
        ["source", "span_s"],
    )
    _assert_equal(old, new, float_tol=1e-9)


@pytest.mark.parametrize("method", ["evd", "mle"])
def test_eigen_rollup_fill_equals_relational(sparse_rollup, method):
    from covsar_spark.operators.eigen import eigen_rollup

    filled = gapfill(sparse_rollup, "1m", "zero")
    old = _collect(eigen_rollup(filled, "1m", method=method), ["source", "span_s"])
    new = _collect(
        eigen_rollup(sparse_rollup, "1m", method=method, fill="zero"),
        ["source", "span_s"],
    )
    _assert_equal(old, new, float_tol=1e-9)


def test_nlfit_rollup_fill_equals_relational(sparse_rollup):
    from covsar_spark.operators.nlfit import nlfit_rollup

    filled = gapfill(sparse_rollup, "1m", "zero")
    old = _collect(nlfit_rollup(filled, "1m"), ["source", "span_s"])
    new = _collect(nlfit_rollup(sparse_rollup, "1m", fill="zero"), ["source", "span_s"])
    _assert_equal(old, new, float_tol=1e-9)


def test_compress_rollup_fill_equals_relational(sparse_rollup):
    from covsar_spark.operators.compress import compress_rollup

    filled = gapfill(sparse_rollup, "1m", "zero")
    old = _collect(compress_rollup(filled, "1m", value_col="rate"), ["source", "span_s"])
    new = _collect(
        compress_rollup(sparse_rollup, "1m", value_col="rate", fill="zero"),
        ["source", "span_s"],
    )
    # blobs must be byte-identical, counts equal — no gemm in this path,
    # so no float tolerance
    _assert_equal(old, new)


def test_contract_outputs_identical(spark):
    """The DECLARED outputs (post-rounding) of every contract entry that
    switched to fill="zero" must be bit-identical to the relational-fill
    chain on real driver data (sf0.001) — the last-ulp BLAS wiggle must
    never survive the contract's 4-6dp rounding."""
    from covsar_spark.contract import QUERIES, _events_1m
    from covsar_spark.operators.closure_correct import closure_correct, corrected_pairs, span_stats
    from covsar_spark.operators.compress import compress_rollup, decompress_chunks
    from covsar_spark.operators.eigen import eigen_rollup

    sf = "/root/testdata/sf0.001"
    roll = gapfill(_events_1m(spark, sf), "1m", "zero")

    # closure_pair_correction: old relational chain, rounded like the entry
    old_pairs = corrected_pairs(closure_correct(roll, "1m")).select(
        "source", "span_s", "i", "j",
        F.round("phi", 6).alias("phi"),
        F.round("phi_err", 6).alias("phi_err"),
        F.round("phi_corr", 6).alias("phi_corr"),
    )
    new_pairs = QUERIES["closure_pair_correction"](spark, sf)
    key = ["source", "span_s", "i", "j"]
    _assert_equal(_collect(old_pairs, key), _collect(new_pairs, key))

    # corrected_drift
    old_drift = span_stats(closure_correct(roll, "1m", emit_pairs=False)).select(
        "source", "span_s", "n_epochs",
        F.round("r", 6).alias("r"),
        F.round("slope", 6).alias("slope"),
        F.round("rmse", 6).alias("rmse"),
        F.round("drift_rms", 6).alias("drift_rms"),
        F.round("bias", 6).alias("bias"),
    )
    key = ["source", "span_s"]
    _assert_equal(_collect(old_drift, key), _collect(QUERIES["corrected_drift"](spark, sf), key))

    # eigen_1m
    old_eig = eigen_rollup(roll, "1m").select(
        "source", "span_s", "n_epochs",
        F.round("lam", 6).cast("double").alias("lam"),
        F.round("tc", 6).cast("double").alias("tc"),
    )
    _assert_equal(_collect(old_eig, key), _collect(QUERIES["eigen_1m"](spark, sf), key))

    # codec_roundtrip (bit-exact end to end, exact oracle entry)
    old_rt = decompress_chunks(compress_rollup(roll, "1m", value_col="rate")).select(
        "source", "epoch_s", F.round("val", 6).cast("double").alias("rate")
    )
    key = ["source", "epoch_s"]
    _assert_equal(_collect(old_rt, key), _collect(QUERIES["codec_roundtrip"](spark, sf), key))


def test_fill_rejects_other_policies(sparse_rollup):
    from covsar_spark.operators.closure_correct import closure_correct

    with pytest.raises(ValueError):
        closure_correct(sparse_rollup, "1m", fill="ffill")


def test_fill_shuffles_sparse_rows_only(sparse_rollup, spark):
    """Plan shape: the in-kernel-fill path has NO grid join (a second scan
    of the rollup joined to an exploded calendar) — one union of sentinels
    with observed rows feeding one repartition."""
    from covsar_spark.operators.eigen import eigen_rollup

    plan = eigen_rollup(
        sparse_rollup, "1m", fill="zero"
    )._sc._jvm.PythonSQLUtils.explainString(
        eigen_rollup(sparse_rollup, "1m", fill="zero")._jdf.queryExecution(), "formatted"
    )
    assert "Join LeftOuter" not in plan and "SortMergeJoin" not in plan, plan
