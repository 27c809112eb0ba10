"""Tier-table persistence: Iceberg-layout partitioned parquet.

The reference's "catalog" is a glob over directories whose names are the
epochs (covsar/closure_inten.py:68-78), and its sink is a raw binary file +
XML sidecar (covsar/isceio.py:13-35). Here: one source abstraction over
columnar tables, written partitioned by (tier, day) so epoch-range predicates
become partition pruning. Real Iceberg needs jars not present in this image —
`write_tier` degrades to a plain partitioned parquet dir with an identical
layout, behind an import-try on the iceberg catalog (SURVEY.md S8).

Scale notes: day-level partitions keep file counts sane at 10^12 sequences
(1m tier: 1440 rows/source/day; sources x days directories); sorting within
partitions by (source, epoch_s) gives parquet min/max stats that prune
source-range scans too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        # attribute access on _jvm returns a lazy JavaPackage even for
        # missing classes — force real classloading
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


def utc_day(col: str = "epoch_s") -> F.Column:
    """Partition day key as a DATE from INTEGER UTC day arithmetic
    (date_from_unix_date(floor(epoch/86400))) — no timezone function, so a
    table written and read under different spark.sql.session.timeZone values
    prunes identically (round-4 review: date_format keys silently dropped
    rows across sessions; streaming/cascade_stream.py uses the same
    integer-day principle)."""
    return F.date_from_unix_date(F.floor(F.col(col) / 86400).cast("int"))


def _utc_day_lit(epoch: int) -> F.Column:
    return F.date_from_unix_date(F.lit(int(epoch) // 86400))


def write_tier(
    roll: DataFrame, path: str, tier: str, mode: str = "overwrite", table: str | None = None
) -> None:
    """Persist a tier rollup partitioned by UTC day.

    With ``table`` set AND iceberg jars on the classpath, commits to that
    catalog TABLE (append honors ``mode='append'``); the filesystem ``path``
    form is always the identical-layout partitioned parquet — `read_tier`
    reads the path form. (Previously the Iceberg branch passed the PATH to
    writeTo() — an invalid multipart identifier — and ignored ``mode``;
    round-4 review.)"""
    with_day = roll.withColumn("day", utc_day())
    spark = roll.sparkSession
    if table is not None and _has_iceberg(spark):  # pragma: no cover — jars absent here
        w = with_day.writeTo(table)
        if mode == "append":
            w.append()
        else:
            w.partitionedBy("day").createOrReplace()
        return
    (
        # repartition by (day, source): one task per day would funnel every
        # source of that day through a single sorter/writer (straggler/OOM
        # at 10^12-sequence scale); day-level directories still come from
        # partitionBy, now with per-source-group files inside
        with_day.repartition("day", "source")
        .sortWithinPartitions("source", "epoch_s")
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )


def read_tier(spark: SparkSession, path: str, lo_epoch: int | None = None, hi_epoch: int | None = None) -> DataFrame:
    """Scan a tier table; epoch bounds become day-partition pruning plus a
    row-level filter (check `.explain` for PartitionFilters)."""
    df = spark.read.parquet(path)
    if lo_epoch is not None:
        df = df.filter((F.col("day") >= _utc_day_lit(lo_epoch)) & (F.col("epoch_s") >= lo_epoch))
    if hi_epoch is not None:
        df = df.filter((F.col("day") <= _utc_day_lit(hi_epoch)) & (F.col("epoch_s") <= hi_epoch))
    return df.drop("day")
