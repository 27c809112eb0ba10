"""S9/S10 sinks: round-trip, quality join, and idempotent (dynamic partition
overwrite) resume semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from covsar_spark.operators.closure import full_triplets
from covsar_spark.operators.closure_correct import closure_correct, span_stats
from covsar_spark.operators.eigen import eigen_rollup
from covsar_spark.sources.sinks import timeseries_frame, write_closures, write_timeseries


def _roll(spark, n_sources=3, epochs=200):
    rows = [
        (f"s{s}", 1767225600 + 60 * t, int((t * 13 + s * 7) % 50) + 1)
        for s in range(n_sources)
        for t in range(epochs)
    ]
    pdf = pd.DataFrame(rows, columns=["source", "epoch_s", "token_count"])
    return spark.createDataFrame(pdf), pdf


def test_write_timeseries_roundtrip(spark, tmp_path):
    sdf, pdf = _roll(spark)
    eig = eigen_rollup(sdf, "1m")
    path = str(tmp_path / "ts")
    write_timeseries(sdf, eig, path, span=3600)
    back = spark.read.parquet(path)
    # one pair row per epoch except each source's first
    assert back.count() == len(pdf) - pdf["source"].nunique()
    # pair_diff matches a pandas lag diff exactly
    got = back.orderBy("source", "epoch_s").toPandas()
    want = pdf.sort_values(["source", "epoch_s"]).groupby("source")["token_count"].diff().dropna()
    np.testing.assert_array_equal(got["pair_diff"].to_numpy(), want.to_numpy())
    # every row carries its span's quality layer
    assert got["tc"].notna().all()
    assert "day" in back.columns  # partition column survives the read


def test_write_timeseries_idempotent_overwrite(spark, tmp_path):
    sdf, _ = _roll(spark, n_sources=2, epochs=100)
    eig = eigen_rollup(sdf, "1m")
    path = str(tmp_path / "ts2")
    write_timeseries(sdf, eig, path, span=3600)
    first = spark.read.parquet(path).toPandas()
    write_timeseries(sdf, eig, path, span=3600)  # re-run = same table
    second = spark.read.parquet(path).toPandas()
    assert len(first) == len(second)
    a = first.sort_values(["source", "epoch_s"]).reset_index(drop=True)
    b = second.sort_values(["source", "epoch_s"]).reset_index(drop=True)
    np.testing.assert_array_equal(a["pair_diff"].to_numpy(), b["pair_diff"].to_numpy())


def test_write_closures_outputs(spark, tmp_path):
    sdf, _ = _roll(spark)
    st = span_stats(closure_correct(sdf, "1m"))
    tr = full_triplets(sdf, span_s=600, max_epochs=10)
    path = str(tmp_path / "cl")
    write_closures(st, tr, path)
    pval = spark.read.parquet(f"{path}/pval")
    trips = spark.read.parquet(f"{path}/triplets")
    assert pval.count() == st.count()
    assert trips.count() == tr.count()
    p = pval.toPandas()
    assert ((p["pval"] >= 0) & (p["pval"] <= 1)).all()


def test_timeseries_frame_quality_is_span_constant(spark):
    sdf, _ = _roll(spark, n_sources=1, epochs=120)
    eig = eigen_rollup(sdf, "1m")
    f = timeseries_frame(sdf, eig, span=3600).withColumn(
        "span_s", (F.floor(F.col("epoch_s") / 3600) * 3600).cast("long")
    )
    per_span = f.groupBy("span_s").agg(F.count_distinct("tc").alias("k")).toPandas()
    assert (per_span["k"] == 1).all()
