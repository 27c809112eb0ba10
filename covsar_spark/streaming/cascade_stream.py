"""Streaming continuous-aggregate maintenance: the 1h tier kept up to date
from the streamed 1m tier (the streaming form of A7 `relook` re-aggregation,
covsar/covariance.py:48-61; SURVEY.md §2.9).

Shape: watermarked append-mode 1m rollup -> `foreachBatch` maintenance:

  1. the finalized 1m windows of each micro-batch land in the 1m tier dir
     partitioned by `batch_id` — a REPLAYED batch overwrites its own
     partition, so the sink is exactly-once without a transaction log
     (Iceberg/Delta would make this a commit; the layout degrades the same
     way sources/tables.py does),
  2. the batch's affected (day) partitions of the 1h tier are recomputed
     FROM the full 1m tier and dynamically overwritten — idempotent window
     re-rollup, the engine's resume primitive (plans/checkpoint.py shares
     the same principle).

Exactness: integral sums re-aggregate exactly, so the streamed 1h tier must
equal a batch cascade over the same finalized 1m windows bit-for-bit
(tests/test_streaming.py::test_streaming_cascade_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup_stream import read_tokens_stream, streaming_rollup


def _day(col: str = "epoch_s") -> F.Column:
    return F.date_format(F.timestamp_seconds(F.col(col)), "yyyy-MM-dd")


def cascade_1h_from_1m(m1: DataFrame) -> DataFrame:
    """Exact 1h re-rollup of 1m tier rows (integral sums; relook law)."""
    return m1.groupBy(
        "source", (F.floor(F.col("epoch_s") / 3600) * 3600).cast("long").alias("epoch_s")
    ).agg(
        F.sum("token_count").alias("token_count"),
        F.sum("n_docs").alias("n_docs"),
        F.max("max_tok").alias("max_tok"),
        F.min("min_tok").alias("min_tok"),
    )


def run_cascade_stream(
    spark: SparkSession, tokens_path: str, out_dir: str, watermark: str = "10 minutes"
) -> tuple[str, str]:
    """Drive the stream over a static dir to completion (test/smoke path);
    returns (tier_1m_dir, tier_1h_dir). In production the same query runs
    forever with a checkpointLocation."""
    tier_1m = f"{out_dir}/tier_1m"
    tier_1h = f"{out_dir}/tier_1h"
    m1 = streaming_rollup(read_tokens_stream(spark, tokens_path), "1m", watermark)

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        if b.count() == 0:
            b.unpersist()
            return
        sess = b.sparkSession
        prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # (1) exactly-once 1m append: the batch owns its partition
            (
                b.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(tier_1m)
            )
            # (2) recompute ONLY the days this batch touched, from the full
            # 1m tier, and overwrite exactly those 1h partitions. The collect
            # is a DISTINCT DAY list — bounded by the watermark horizon (a
            # handful of strings per micro-batch), never row data.
            days = [r["day"] for r in b.select(_day().alias("day")).distinct().collect()]
            full_1m = sess.read.parquet(tier_1m).filter(_day().isin(days))
            (
                cascade_1h_from_1m(full_1m)
                .withColumn("day", _day())
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(tier_1h)
            )
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            b.unpersist()

    q = m1.writeStream.outputMode("append").foreachBatch(maintain).start()
    q.processAllAvailable()
    q.stop()
    return tier_1m, tier_1h
