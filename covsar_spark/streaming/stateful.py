"""Custom stateful streaming operator: running per-source accumulator.

The reference's one true running-state computation is the nearest-neighbor
phase-linking cumulative product (covsar/pl/nn.py:5-9) — a per-key state
carried across epochs. Streamed, that becomes `applyInPandasWithState`
(SURVEY.md §2.9): per source we carry (total tokens, doc count, last epoch,
EMA of the per-batch token rate) across micro-batches and emit one update row
per batch.

Batch-equivalence: the final emitted totals per source must equal the batch
groupBy sums exactly (integral state — test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..schemas import EPOCH0_UNIX, HORIZON_S, TOKENS_SCHEMA

OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("total_tokens", T.LongType(), False),
        T.StructField("total_docs", T.LongType(), False),
        T.StructField("last_epoch_s", T.LongType(), False),
        T.StructField("rate_ema", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_tokens", T.LongType(), False),
        T.StructField("total_docs", T.LongType(), False),
        T.StructField("last_epoch_s", T.LongType(), False),
        T.StructField("rate_ema", T.DoubleType(), False),
    ]
)

EMA_ALPHA = 0.3


def _update(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    tot_t, tot_d, last_e, ema = (
        state.get if state.exists else (0, 0, 0, 0.0)
    )
    batch_t = batch_d = 0
    batch_last = last_e
    for pdf in pdfs:
        batch_t += int(pdf["n_tok"].sum())
        batch_d += len(pdf)
        if len(pdf):
            batch_last = max(batch_last, int(pdf["epoch_s"].max()))
    tot_t += batch_t
    tot_d += batch_d
    batch_rate = batch_t / max(batch_d, 1)
    ema = batch_rate if tot_d == batch_d else (1 - EMA_ALPHA) * ema + EMA_ALPHA * batch_rate
    state.update((tot_t, tot_d, batch_last, float(ema)))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "total_tokens": [tot_t],
            "total_docs": [tot_d],
            "last_epoch_s": [batch_last],
            "rate_ema": [float(ema)],
        }
    )


def stateful_totals_stream(tokens_stream: DataFrame) -> DataFrame:
    """Per-source running totals with EMA, one update row per micro-batch."""
    with_e = tokens_stream.withColumn(
        "epoch_s",
        (F.lit(EPOCH0_UNIX) + F.pmod(F.crc32(F.col("doc_id").cast("binary")), F.lit(HORIZON_S))).cast(
            "long"
        ),
    ).select("source", "n_tok", "epoch_s")
    return with_e.groupBy("source").applyInPandasWithState(
        _update, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def run_stateful_to_memory(spark: SparkSession, path: str, name: str = "stateful_out"):
    stream = (
        spark.readStream.schema(TOKENS_SCHEMA).option("maxFilesPerTrigger", 2).parquet(path)
    )
    q = (
        stateful_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
