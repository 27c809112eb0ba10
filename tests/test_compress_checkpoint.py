"""Spark-side codec round-trip + checkpoint/resume semantics."""

from __future__ import annotations

import numpy as np

from covsar_spark.operators.compress import compress_rollup, decompress_chunks
from covsar_spark.operators.rollup import rollup_tokens, with_event_time
from covsar_spark.operators.gapfill import gapfill
from covsar_spark.plans.checkpoint import CheckpointManifest, run_resumable

from .conftest import cols_to_spark


def test_chunk_roundtrip_exact(spark, tiny_cols):
    df = with_event_time(cols_to_spark(spark, tiny_cols))
    filled = gapfill(rollup_tokens(df, "1m"), "1m", "zero")
    chunks = compress_rollup(filled, "1m", value_col="rate")
    back = decompress_chunks(chunks).toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    orig = (
        filled.select("source", "epoch_s", "rate")
        .toPandas()
        .sort_values(["source", "epoch_s"])
        .reset_index(drop=True)
    )
    assert len(back) == len(orig)
    assert (back["source"] == orig["source"]).all()
    assert np.array_equal(back["epoch_s"].to_numpy(), orig["epoch_s"].to_numpy())
    assert np.array_equal(
        back["val"].to_numpy().view(np.uint64), orig["rate"].to_numpy().view(np.uint64)
    ), "decompressed values not bit-identical"


def test_chunk_compression_ratio(spark, tiny_cols):
    df = with_event_time(cols_to_spark(spark, tiny_cols))
    filled = gapfill(rollup_tokens(df, "1m"), "1m", "zero")
    stats = compress_rollup(filled, "1m").selectExpr(
        "sum(n_points) AS pts", "sum(length(ts_blob)+length(val_blob)) AS packed"
    ).collect()[0]
    assert stats["packed"] < 16 * stats["pts"], "codec must beat raw 16B/point"


def test_resume_skips_done_partitions(spark, tiny_cols, tmp_path):
    df = with_event_time(cols_to_spark(spark, tiny_cols))
    calls = []

    def build(part: str):
        calls.append(part)
        return rollup_tokens(df.filter(df.source == part), "1m")

    man = CheckpointManifest(str(tmp_path / "ckpt"))
    r1 = run_resumable(man, ["web", "code"], build)
    assert calls == ["web", "code"]
    assert all(not m["skipped"] for m in r1.values())
    # resume: nothing re-runs, new partition runs
    r2 = run_resumable(man, ["web", "code", "books"], build)
    assert calls == ["web", "code", "books"]
    assert r2["web"]["skipped"] and r2["code"]["skipped"] and not r2["books"]["skipped"]
    # outputs identical across resume
    a = spark.read.parquet(man.partition_dir("web")).toPandas().sort_values("epoch_s")
    direct = rollup_tokens(df.filter(df.source == "web"), "1m").toPandas().sort_values("epoch_s")
    assert np.array_equal(a["token_count"].to_numpy(), direct["token_count"].to_numpy())


def test_manifest_tolerates_torn_trailing_line(tmp_path):
    """Crash mid-append leaves a partial json line: done() must skip it (the
    partition re-runs, idempotent), and the next record() must heal the
    newline-less tail instead of concatenating onto it."""
    import json

    from covsar_spark.plans.checkpoint import CheckpointManifest

    m = CheckpointManifest(str(tmp_path / "ckpt"))
    m.record("p0", {"rows": 1})
    # simulate a torn append: partial record, no newline
    with open(m.path, "a") as f:
        f.write('{"partition": "p1", "st')
    done = m.done()
    assert set(done) == {"p0"}  # torn line skipped, prior record intact
    m.record("p2", {"rows": 3})
    done = m.done()
    assert set(done) == {"p0", "p2"}
    # every surviving line is valid json
    for line in open(m.path):
        if line.strip():
            try:
                json.loads(line)
            except json.JSONDecodeError:
                assert line.startswith('{"partition": "p1"')  # only the torn one
