"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a struct of metadata; the
decode / feature-extract / resize / frame-sample steps are Pandas UDFs over
`mapInPandas`. The actual media libs are NOT in this container, so the decode
step is a deterministic fake behind `FAKE_DECODE` (clearly marked) — the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch shape)
is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16

# ---------------------------------------------------------------------------
# STUB: deterministic fake decode. A real deployment swaps this for
# PIL/libsndfile/ffmpeg decoding; everything around it stays unchanged.
# ---------------------------------------------------------------------------


def FAKE_DECODE(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic pseudo-decode: bytes -> fixed-dim float32 'pixels'."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    return np.random.default_rng(seed).random(64, dtype=np.float32)


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        meta = (
            (64, 48, None, None)
            if kind == "image"
            else (None, None, 16000, None)
            if kind == "audio"
            else (64, 48, None, 30)
        )
        rows.append((f"m-{i:06d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """decode -> pooled feature vector, one Arrow batch at a time.

    Output: (media_id, kind, feat array<float>, payload_sha string). The
    sha proves byte-exact payload pass-through across the Arrow boundary.
    """

    def op(it):
        for pdf in it:
            feats, shas = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = FAKE_DECODE(bytes(payload), kind)
                pooled = raw.reshape(dim, -1).mean(axis=1)  # "resize" / pool
                feats.append(pooled.astype(np.float32))
                shas.append(hashlib.sha256(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "payload_sha": shas,
                }
            )

    return media.mapInPandas(
        op, "media_id string, kind string, feat array<float>, payload_sha string"
    )


def read_binary_dir(spark, path: str, pattern: str = "*.bin") -> DataFrame:
    """S3 raw binary scan (covsar/isceio.py:131-143 `np.fromfile` analogue):
    Spark's built-in binaryFile source — one row per file with (path,
    modificationTime, length, content) — mapped onto MEDIA_SCHEMA. Kind is
    derived from the filename stem (`<id>.<kind>.bin`); metadata defaults
    ride along for the decode stub."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    return raw.select(
        F.element_at(F.split(base, r"\."), 1).alias("media_id"),
        F.element_at(F.split(base, r"\."), 2).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (the decode of the actual frame bytes is the FAKE_DECODE stub)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))).alias("frame_idx"),
    )
