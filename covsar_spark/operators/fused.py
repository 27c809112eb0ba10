"""Fused eigen + codec kernel: one grouped-map pass per (source, span-bucket)
emits BOTH the dominant-eigenpair row and the compressed chunk blobs.

Motivation (plan-level): `eigen_rollup` and `compress_rollup` shuffle the
same gap-filled tier on the same key and sort the same groups — running them
separately doubles the exchange + Arrow traffic. CovSAR makes the equivalent
fusion decision when it computes closure, regression and correction inside
one per-pixel loop instead of re-scanning the stack per output
(covsar/closure_inten.py:235-345).

Math identical to operators/eigen.lagcov_eig_batch + operators/codecs (the
exactness tests compare this path against the unfused ones).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EIGEN_P, EIGEN_SPAN
from .codecs import encode_dod_many, encode_xor_many
from .eigen import lagcov_eig_batch

FUSED_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("span_s", T.LongType(), False),
        T.StructField("n_epochs", T.IntegerType(), False),
        T.StructField("lam", T.DoubleType(), False),
        T.StructField("tc", T.DoubleType(), False),
        T.StructField("eig", T.ArrayType(T.DoubleType(), containsNull=False), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("ts_blob", T.BinaryType(), False),
        T.StructField("val_blob", T.BinaryType(), False),
    ]
)


def _process_spans(pdf: pd.DataFrame, p: int) -> pd.DataFrame:
    """Vectorized span processing: pdf MUST be sorted by (source, span_s,
    epoch_s) and contain only whole spans. No per-row Python: span boundaries
    by array diff, one batched eigh per series length, one segmented encode
    pass for all blobs."""
    src = pdf["source"].to_numpy()
    spn = pdf["span_s"].to_numpy(np.int64)
    eps = pdf["epoch_s"].to_numpy(np.int64)
    ev = pdf["ev"].to_numpy(np.float64)
    cv = pdf["cv"].to_numpy(np.float64)
    n = len(spn)
    change = (spn[1:] != spn[:-1]) | (src[1:] != src[:-1])
    bounds = np.flatnonzero(change) + 1
    starts = np.concatenate([[0], bounds])
    series = np.split(ev, bounds)
    res = lagcov_eig_batch(series, p)
    ts_blobs = encode_dod_many(np.split(eps, bounds))
    val_blobs = encode_xor_many(np.split(cv, bounds))
    lens = np.diff(np.concatenate([starts, [n]]))
    return pd.DataFrame(
        {
            "source": src[starts],
            "span_s": spn[starts],
            "n_epochs": lens.astype(np.int32),
            "lam": [r[0] for r in res],
            "tc": [r[1] for r in res],
            "eig": [r[2] for r in res],
            "n_points": lens.astype(np.int32),
            "ts_blob": ts_blobs,
            "val_blob": val_blobs,
        }
    )


def eigen_chunks(
    rollup: DataFrame,
    tier: str,
    p: int = EIGEN_P,
    eigen_value_col: str = "token_count",
    chunk_value_col: str = "rate",
) -> DataFrame:
    """One shuffle, zero object aggregation, zero per-group dispatch:

      repartition(source, span) -> sortWithinPartitions -> mapInPandas

    Every span's rows are co-located (hash on the span key) and contiguous
    (partition sort), so the Python side detects span boundaries with an
    array diff and processes THOUSANDS of spans per Arrow batch — batched
    eigh per series length (covsar/library.py:121-128 pattern, maximally
    wide) and one segmented bit-pack for all blobs. An Arrow batch can split
    a span across batches, so the kernel carries the last (possibly
    incomplete) span group into the next batch.

    Earlier designs measured and rejected (BENCH.md): per-span applyInPandas
    (Arrow dispatch per 60-row group), JVM collect_list packing (ObjectHash-
    Aggregate on every rollup point dominated the profile at 21M points).
    """
    span = EIGEN_SPAN[tier]
    sess = rollup.sparkSession
    n_part = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    prep = (
        rollup.withColumn("span_s", (F.floor(F.col("epoch_s") / span) * span).cast("long"))
        .select(
            "source",
            "span_s",
            "epoch_s",
            F.col(eigen_value_col).cast("double").alias("ev"),
            F.col(chunk_value_col).cast("double").alias("cv"),
        )
        .repartition(n_part, "source", "span_s")
        .sortWithinPartitions("source", "span_s", "epoch_s")
    )

    def kernel(it):
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # hold back the trailing span — the next batch may continue it
            src = pdf["source"].to_numpy()
            spn = pdf["span_s"].to_numpy()
            last_start = int(
                np.flatnonzero((spn != spn[-1]) | (src != src[-1]))[-1] + 1
                if ((spn != spn[-1]) | (src != src[-1])).any()
                else 0
            )
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            if len(head):
                yield _process_spans(head, p)
        if carry is not None and len(carry):
            yield _process_spans(carry, p)

    return prep.mapInPandas(kernel, FUSED_SCHEMA)
