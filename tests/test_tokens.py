"""pack_sequences: the salted two-level prefix sum must equal the
single-window form exactly (integer-cumsum associativity), and its heavy
doc-level window must actually be partitioned by (source, chunk) — the
round-5 conversion of the documented per-source-reducer skew bound into a
tested scale path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from covsar_spark.operators.tokens import pack_sequences


def _skewed_tokens(spark):
    """One hot source (900 docs) + two small ones — the skew shape the
    single-reducer window degrades on."""
    rows = []
    for i in range(900):
        rows.append(("hot", f"doc-{i:012d}", 100 + (i * 37) % 400))
    for i in range(40):
        rows.append(("warm", f"doc-{i:012d}", 50 + (i * 13) % 300))
    for i in range(7):
        rows.append(("cold", f"doc-{i:012d}", 2048 * 3 + i))  # spans bins
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "n_tok"])
    )


def _chunk_col(docs_per_chunk: int = 64):
    # numeric suffix of the zero-padded id: monotone in the string order
    return F.floor(F.substring("doc_id", 5, 12).cast("long") / docs_per_chunk)


def test_salted_equals_single_window(spark):
    t = _skewed_tokens(spark)
    base = pack_sequences(t, capacity=2048).orderBy("source", "bin").collect()
    salted = (
        pack_sequences(t, capacity=2048, chunk=_chunk_col(64))
        .orderBy("source", "bin")
        .collect()
    )
    assert [r.asDict() for r in base] == [r.asDict() for r in salted]


def test_salted_equals_single_window_odd_chunks(spark):
    """Chunk size not dividing source sizes + chunk 0 absent for a source
    (cold has only 7 docs -> single partial chunk)."""
    t = _skewed_tokens(spark)
    for dpc in (1, 13, 1000):
        base = pack_sequences(t, capacity=512).orderBy("source", "bin").collect()
        salted = (
            pack_sequences(t, capacity=512, chunk=_chunk_col(dpc))
            .orderBy("source", "bin")
            .collect()
        )
        assert [r.asDict() for r in base] == [r.asDict() for r in salted], dpc


def test_salted_window_is_chunk_partitioned(spark):
    """The doc-level window must run per (source, chunk): the plan's window
    spec over the full row set carries both partition keys, so max task =
    max chunk, not max source."""
    t = _skewed_tokens(spark)
    plan = pack_sequences(t, capacity=2048, chunk=_chunk_col(64))._jdf.queryExecution().executedPlan().toString()
    window_lines = [ln for ln in plan.split("\n") if "Window" in ln and "_cum_local" in ln]
    assert window_lines, plan
    assert all("_chunk" in ln for ln in window_lines), window_lines


def test_contract_token_packing_matches_unsalted(spark):
    """The contract entry (salted, 256-doc chunks) equals the plain form on
    the real sf0.001 tokens table."""
    from covsar_spark import contract

    sf_dir = "/root/testdata/sf0.001"
    salted = contract.QUERIES["token_packing"](spark, sf_dir)
    base = pack_sequences(contract._tokens(spark, sf_dir), capacity=2048)
    assert salted.exceptAll(base).count() == 0
    assert base.exceptAll(salted).count() == 0
