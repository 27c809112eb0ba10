"""Streamed span finalization == batch tier kernel (SURVEY §2.9 closed-stack
semantics): the watermark-gated `span_stream` must reproduce the batch
`tier_kernel` output BIT-FOR-BIT (eigen lam/tc/eig and both codec blobs) on
spans whose data extent aligns to span boundaries — the declared parity
surface (span_stream.py module docstring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from covsar_spark.operators.tier_kernel import tier_kernel
from covsar_spark.schemas import EIGEN_SPAN, ROLLUP_SCHEMA, TIERS
from covsar_spark.streaming.span_stream import run_span_stream_to_memory

TIER = "1m"
TIER_S = TIERS[TIER]
SPAN = EIGEN_SPAN[TIER]
BASE = 1_700_000_000 - (1_700_000_000 % SPAN)  # span-aligned origin


def _rollup_rows():
    """3 sources x 3 spans of 1m rollup rows with in-span gaps. Each span
    keeps its FIRST epoch (no fully-empty spans — a streamed span needs >=1
    row to exist) and each source keeps its span-aligned first/last epoch
    (so the batch extent clip is a no-op and parity is exact)."""
    rows = []
    for si, source in enumerate(["alpha", "beta", "gamma"]):
        for sp in range(3):
            span_s = BASE + sp * SPAN
            for k in range(SPAN // TIER_S):
                epoch = span_s + k * TIER_S
                is_last = sp == 2 and k == SPAN // TIER_S - 1
                # deterministic gap pattern, never the span's first epoch
                if k > 0 and not is_last and (k * 7 + si + sp) % 3 == 0:
                    continue
                tok = 50 + (k * 13 + si * 101 + sp * 29) % 400
                rows.append(
                    (source, epoch, tok, 1 + tok % 7, tok + 5, max(tok - 5, 0),
                     tok / float(TIER_S), False)
                )
    return rows


def test_span_stream_matches_batch_kernel(spark, tmp_path):
    rows = _rollup_rows()
    # flush source: advances the watermark past every real span's end so all
    # real spans time out and emit; its own span stays open and is excluded
    flush_epoch = BASE + 10 * SPAN
    pdf = pd.DataFrame(
        rows + [("zz_flush", flush_epoch, 1, 1, 1, 1, 1.0 / TIER_S, False)],
        columns=[f.name for f in ROLLUP_SCHEMA.fields],
    )
    path = str(tmp_path / "rollup")
    spark.createDataFrame(pdf, schema=ROLLUP_SCHEMA).coalesce(4).write.parquet(path)

    # lateness covers the whole 3-span fixture horizon: static files replay
    # in arbitrary order within one write, so any real row may trail the max
    # seen event time by up to the horizon without being "late"
    got = (
        run_span_stream_to_memory(spark, path, TIER, name="span_parity", watermark="4 hours")
        .filter(F.col("source") != "zz_flush")
        .toPandas()
        .sort_values(["source", "span_s"])
        .reset_index(drop=True)
    )

    batch_in = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in ROLLUP_SCHEMA.fields]),
        schema=ROLLUP_SCHEMA,
    )
    exp = (
        tier_kernel(batch_in, TIER, emit_points=False)
        .toPandas()
        .sort_values(["source", "span_s"])
        .reset_index(drop=True)
    )

    assert len(got) == len(exp) == 9, (len(got), len(exp))
    for c in ("source", "span_s", "n_epochs", "n_points"):
        assert got[c].tolist() == exp[c].tolist(), c
    # bit-exact kernel outputs: same _process on the same series
    assert got["lam"].tolist() == exp["lam"].tolist()
    assert got["tc"].tolist() == exp["tc"].tolist()
    for g, e in zip(got["eig"], exp["eig"]):
        assert np.array_equal(np.asarray(g), np.asarray(e))
    assert [bytes(b) for b in got["ts_blob"]] == [bytes(b) for b in exp["ts_blob"]]
    assert [bytes(b) for b in got["val_blob"]] == [bytes(b) for b in exp["val_blob"]]


def test_span_stream_last_per_epoch_wins(spark, tmp_path):
    """An upstream window re-finalization (same epoch arriving twice) must
    not double-count: the streamed state dedups to the LAST row per epoch at
    finalize."""
    span_s = BASE
    # first/last epoch of the span present -> batch extent clip is a no-op
    first = [("solo", span_s + k * TIER_S, 10, 1, 10, 10, 10 / float(TIER_S), False)
             for k in (0, 1, 2, 3, SPAN // TIER_S - 1)]
    # re-emit epoch 2 with a corrected count — later file, later micro-batch
    fixed = [("solo", span_s + 2 * TIER_S, 99, 2, 99, 99, 99 / float(TIER_S), False)]
    flush = [("zz_flush", span_s + 10 * SPAN, 1, 1, 1, 1, 1.0 / TIER_S, False)]
    cols = [f.name for f in ROLLUP_SCHEMA.fields]
    path = str(tmp_path / "rollup2")
    spark.createDataFrame(pd.DataFrame(first, columns=cols), schema=ROLLUP_SCHEMA).coalesce(
        1
    ).write.parquet(path)
    spark.createDataFrame(
        pd.DataFrame(fixed + flush, columns=cols), schema=ROLLUP_SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)

    got = (
        run_span_stream_to_memory(
            spark, path, TIER, name="span_dedup", max_files=1, watermark="4 hours"
        )
        .filter(F.col("source") == "solo")
        .toPandas()
    )
    assert len(got) == 1
    batch_in = spark.createDataFrame(
        pd.DataFrame(first[:2] + fixed + first[3:], columns=cols), schema=ROLLUP_SCHEMA
    )
    exp = tier_kernel(batch_in, TIER, emit_points=False).toPandas()
    assert got["lam"].tolist() == exp["lam"].tolist()
    assert [bytes(b) for b in got["val_blob"]] == [bytes(b) for b in exp["val_blob"]]
