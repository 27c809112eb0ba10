"""Compressed tier persistence: pack each (source, span) chunk of rollup
points into Gorilla XOR + delta-of-delta blobs (the engine's analogue of the
reference's binary raster sink, covsar/isceio.py:13-35).

The heavy path is the encoder, reached through ONE `applyInPandas` per chunk
group: timestamps/values are collected per (source, span), canonically
ordered, and bit-packed by the vectorized numpy codecs. Decode (`read_chunks`)
is the cold path, used for verification and point reads.

Scale notes: chunk size = span/tier points (60 or 24); blobs land in a
partitioned table keyed (source, span) — at 100 TB this is the retention
store, orders of magnitude smaller than raw, and pruning on (source, span)
ranges is partition pruning on the sink table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CHUNK_SCHEMA
from .spanbucket import with_span_bucket
from .codecs import decode_dod, decode_xor, encode_dod, encode_xor


def compress_rollup(
    rollup: DataFrame, tier: str, value_col: str = "rate", spans_per_bucket: int = 64
) -> DataFrame:
    """tier rollup -> one compressed chunk row per (source, eigen-span).

    Grouped by (source, span-bucket), NOT per span: one Arrow round-trip
    carries many spans; the kernel splits locally (same shape as the eigen
    kernel — per-span groups are too small to amortize UDF overhead).
    """
    with_span = with_span_bucket(
        rollup, tier, spans_per_bucket, F.col(value_col).cast("double").alias("val")
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (src, sp), g in pdf.groupby(["source", "span_s"], sort=True, observed=True):
            g = g.sort_values("epoch_s", kind="mergesort")
            ts = g["epoch_s"].to_numpy(np.int64)
            vals = g["val"].to_numpy(np.float64)
            rows.append((src, sp, len(g), encode_dod(ts), encode_xor(vals)))
        return pd.DataFrame(
            rows, columns=["source", "span_s", "n_points", "ts_blob", "val_blob"]
        )

    return with_span.groupBy("source", "_bkt").applyInPandas(enc, CHUNK_SCHEMA)


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """chunk rows -> exploded (source, epoch_s, val) points (cold read path)."""

    def dec(it):
        for pdf in it:
            srcs, eps, vals = [], [], []
            for src, n, tb, vb in zip(
                pdf["source"].to_numpy(),
                pdf["n_points"].to_numpy(),
                pdf["ts_blob"].to_numpy(),
                pdf["val_blob"].to_numpy(),
            ):
                n = int(n)
                ts = decode_dod(bytes(tb), n)
                vs = decode_xor(bytes(vb), n)
                srcs.append(np.repeat(src, n))
                eps.append(ts)
                vals.append(vs)
            srcs = np.concatenate(srcs) if srcs else np.array([], dtype=object)
            yield pd.DataFrame(
                {
                    "source": srcs,
                    "epoch_s": np.concatenate(eps) if eps else np.array([], np.int64),
                    "val": np.concatenate(vals) if vals else np.array([], np.float64),
                }
            )

    return chunks.mapInPandas(dec, "source string, epoch_s long, val double")
