"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline (tokens -> tier rollups -> gap-fill
-> lag-cov eigen kernel) over a deterministic synthetic tokens table derived
from the sf0.001 documents parquet. `queries()` / `oracle_sql()` delegate to
covsar_spark.contract (one entry per implemented operator, SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tokens_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tokens table (BASELINE.json:input_hint shape) derived
    from the driver's documents parquet: tokens = md5-hashed words."""
    from covsar_spark.operators.text import md5_int40, words_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = F.transform(words_col(), lambda w: F.pmod(md5_int40(w), F.lit(50257)).cast("int"))
    return docs.select(
        F.concat(F.lit("doc-"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("doc_id"),
        tokens.alias("tokens"),
        # size of the UNhashed word array — transform preserves length, and
        # sizing the hashed expression re-evaluated ~100 interpreted md5
        # lambdas per doc a second time (round-4 review)
        F.size(words_col()).cast("int").alias("n_tok"),
        "source",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from covsar_spark.plans.pipeline import flagship

    tokens = _tokens_from_documents(spark, "/root/testdata/sf0.001")
    return flagship(tokens).withColumn("eig", F.col("eig").cast("array<double>"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Priority order, not registration order: the driver verifies the first 50
    # entries, so never-yet-verified and unique-signal oracle entries come
    # first (see covsar_spark.contract.ordered_queries).
    from covsar_spark.contract import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from covsar_spark.contract import ORACLE

    return dict(ORACLE)
