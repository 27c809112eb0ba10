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


def write_tier(roll: DataFrame, path: str, tier: str, mode: str = "overwrite") -> None:
    """Persist a tier rollup partitioned by day; Iceberg table if jars are on
    the classpath, identical-layout parquet otherwise."""
    with_day = roll.withColumn(
        "day", F.date_format(F.timestamp_seconds(F.col("epoch_s")), "yyyy-MM-dd")
    )
    spark = roll.sparkSession
    if _has_iceberg(spark):  # pragma: no cover — jars absent in this image
        with_day.writeTo(path).partitionedBy("day").createOrReplace()
        return
    (
        with_day.repartition("day")
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
        lo_day = F.date_format(F.timestamp_seconds(F.lit(lo_epoch)), "yyyy-MM-dd")
        df = df.filter((F.col("day") >= lo_day) & (F.col("epoch_s") >= lo_epoch))
    if hi_epoch is not None:
        hi_day = F.date_format(F.timestamp_seconds(F.lit(hi_epoch)), "yyyy-MM-dd")
        df = df.filter((F.col("day") <= hi_day) & (F.col("epoch_s") <= hi_epoch))
    return df.drop("day")
