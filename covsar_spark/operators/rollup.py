"""Tumbling-window continuous aggregates over the tokens table.

The reference analogue is `multilook` spatial averaging
(covsar/library.py:303-317) and `relook` re-aggregation
(covsar/covariance.py:48-61): a windowed mean/sum, then a coarser re-rollup of
the already-aggregated result. Here the window axis is event time at retention
tiers 1m/1h/1d; the coarser tier is computed FROM the finer one (cascade), so
sums re-add exactly (counts stay integral end-to-end, SURVEY.md §7.4).

Scale notes (100 TB / 1000 executors):
- one shuffle per rollup, hash-partitioned on (source, window) — partial
  aggregation (map-side combine) happens automatically for sum/count/min/max;
- the tier cascade aggregates the *rollup* output (tiny vs raw), never rescans
  raw tokens;
- Zipf-skewed `source` is handled by two-level salted aggregation: partial
  per (source, window, salt) then final per (source, window). Long sums are
  order-free so exactness survives salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EPOCH0_UNIX, HORIZON_S, TIERS


def with_event_time(tokens: DataFrame, horizon_s: int = HORIZON_S) -> DataFrame:
    """Derive deterministic event time (FIXTURES.md F1): epoch0 +
    crc32(doc_id) % horizon. Computed, never stored — token arrays pass
    through byte-identical. `crc32` is a JVM builtin (zlib-compatible)."""
    epoch = F.lit(EPOCH0_UNIX) + F.pmod(F.crc32(F.col("doc_id").cast("binary")), F.lit(horizon_s))
    return tokens.withColumn("epoch_s", epoch.cast("long")).withColumn(
        "ts", F.timestamp_seconds(F.col("epoch_s"))
    )


def _win(epoch_col, tier_s: int):
    return (F.floor(epoch_col / tier_s) * tier_s).cast("long")


def rollup_tokens(tokens_ts: DataFrame, tier: str, salt_buckets: int = 0) -> DataFrame:
    """Base rollup: raw tokens -> per-(source, tier window) aggregates.

    With ``salt_buckets`` > 0, aggregates first per (source, window, salt)
    then re-reduces — splits a hot source across ``salt_buckets`` reducers
    (reference has no analogue; single machine, SURVEY.md §4.2).
    """
    tier_s = TIERS[tier]
    base = tokens_ts.select(
        "source",
        _win(F.col("epoch_s"), tier_s).alias("epoch_s"),
        F.col("n_tok"),
        F.crc32(F.col("doc_id").cast("binary")).alias("_h"),
    )
    aggs = [
        F.sum(F.col("n_tok").cast("long")).alias("token_count"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tok").alias("max_tok"),
        F.min("n_tok").alias("min_tok"),
    ]
    if salt_buckets > 1:
        partial = base.withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_buckets))).groupBy(
            "source", "epoch_s", "_salt"
        ).agg(*aggs)
        agg = partial.groupBy("source", "epoch_s").agg(
            F.sum("token_count").alias("token_count"),
            F.sum("n_docs").alias("n_docs"),
            F.max("max_tok").alias("max_tok"),
            F.min("min_tok").alias("min_tok"),
        )
    else:
        agg = base.groupBy("source", "epoch_s").agg(*aggs)
    return agg.select(
        "source",
        "epoch_s",
        "token_count",
        "n_docs",
        "max_tok",
        "min_tok",
        (F.col("token_count") / F.lit(float(tier_s))).alias("rate"),
        F.lit(False).alias("filled"),
    )


def cascade(finer: DataFrame, to_tier: str) -> DataFrame:
    """Continuous aggregate: coarser tier computed from the finer tier's
    rollup rows (relook analogue, covsar/covariance.py:48-61). Integral sums
    re-add exactly; gap-filled rows are excluded so the cascade equals a
    direct rollup of raw data."""
    tier_s = TIERS[to_tier]
    return (
        finer.filter(~F.col("filled"))
        .groupBy("source", _win(F.col("epoch_s"), tier_s).alias("epoch_s"))
        .agg(
            F.sum("token_count").alias("token_count"),
            F.sum("n_docs").alias("n_docs"),
            F.max("max_tok").alias("max_tok"),
            F.min("min_tok").alias("min_tok"),
        )
        .select(
            "source",
            "epoch_s",
            "token_count",
            "n_docs",
            "max_tok",
            "min_tok",
            (F.col("token_count") / F.lit(float(tier_s))).alias("rate"),
            F.lit(False).alias("filled"),
        )
    )


def rollup_all_tiers(tokens: DataFrame, salt_buckets: int = 0) -> dict[str, DataFrame]:
    """The full tier cascade 1m -> 1h -> 1d. The 1m result is the only scan of
    raw data; persist it if computing all tiers in one job."""
    ts = with_event_time(tokens)
    m1 = rollup_tokens(ts, "1m", salt_buckets=salt_buckets)
    h1 = cascade(m1, "1h")
    d1 = cascade(h1, "1d")
    return {"1m": m1, "1h": h1, "1d": d1}
