"""Exact repeated token-span dedup (operators/dedup.py span_* functions).

The load-bearing invariant: the hashed 100 TB path is OUTPUT-IDENTICAL to
the content-exact form — hash collisions may only add candidates that the
content re-verification then rejects.
"""

from __future__ import annotations

import pandas.testing as pt
import pytest
from pyspark.sql import functions as F

from covsar_spark.operators.dedup import (
    SPAN_W,
    ngram_positions,
    span_dedup_stats,
    span_dedup_stats_hashed,
)

from .conftest import cols_to_spark


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        ("d1", list(range(20)), 20, "web"),         # 0..19
        ("d2", list(range(5, 25)), 20, "web"),      # shares 5..19 with d1
        ("d3", [1, 2, 3] * 10, 30, "code"),         # pure self-repetition
        ("d4", [99] * 7, 7, "web"),                 # n_tok < w -> excluded
        ("d5", list(range(100, 120)), 20, "misc"),  # unique content
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_planted_counts_exact(planted):
    got = {r["doc_id"]: r.asDict() for r in span_dedup_stats(planted, 8).collect()}
    assert set(got) == {"d1", "d2", "d3", "d5"}  # d4 shorter than w
    # d1/d2 share tokens 5..19: 8 duplicated windows each, 15 tokens covered
    for d in ("d1", "d2"):
        assert got[d]["n_pos"] == 13 and got[d]["dup_pos"] == 8
        assert got[d]["covered_tok"] == 15
        assert got[d]["dup_frac"] == pytest.approx(8 / 13, abs=1e-6)
    # d3: every window repeats (period 3 < w) -> full coverage
    assert got["d3"]["dup_pos"] == got["d3"]["n_pos"] == 23
    assert got["d3"]["covered_tok"] == 30
    assert got["d5"]["dup_pos"] == 0 and got["d5"]["covered_tok"] == 0


@pytest.mark.parametrize("w", [3, 8])
def test_hashed_equals_exact_planted(planted, w):
    a = span_dedup_stats(planted, w).orderBy("doc_id").toPandas()
    b = span_dedup_stats_hashed(planted, w).orderBy("doc_id").toPandas()
    pt.assert_frame_equal(a, b)


def test_hashed_equals_exact_random_corpus(spark, tiny_cols):
    """2000 random-token docs: near-zero true duplication — any divergence
    here is a hash-collision candidate the verifier failed to reject."""
    toks = cols_to_spark(spark, tiny_cols)
    a = span_dedup_stats(toks, SPAN_W).orderBy("doc_id").toPandas()
    b = span_dedup_stats_hashed(toks, SPAN_W).orderBy("doc_id").toPandas()
    pt.assert_frame_equal(a, b)
    assert len(a) == toks.filter(F.col("n_tok") >= SPAN_W).count()


def test_coverage_is_interval_union(spark):
    """Two overlapping dup runs and one disjoint run in a single doc: the
    lag sweep must union intervals, not sum window widths."""
    # doc A repeats B's two separate spans; gap of unique filler between
    span1, span2 = list(range(10)), list(range(50, 60))
    a = span1 + [1000, 1001, 1002] + span2
    b_ = span1 + [2000, 2001, 2002] + span2
    df = spark.createDataFrame(
        [("a", a, len(a), "s"), ("b", b_, len(b_), "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {r["doc_id"]: r.asDict() for r in span_dedup_stats(df, 8).collect()}
    # each span of 10 has 3 windows of 8 -> covered exactly 10+10 tokens
    for d in ("a", "b"):
        assert got[d]["covered_tok"] == 20
        assert got[d]["dup_pos"] == 6


def test_ngram_positions_shape(planted):
    g = ngram_positions(planted, 8)
    assert g.columns == ["doc_id", "n_tok", "pos", "gram"]
    n = g.groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in n}
    assert got == {"d1": 13, "d2": 13, "d3": 23, "d5": 13}
    first = g.filter((F.col("doc_id") == "d1") & (F.col("pos") == 0)).first()
    assert first["gram"] == list(range(8))
