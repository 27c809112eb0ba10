"""Fused eigen+codec kernel must equal the unfused operators exactly."""

from __future__ import annotations

import numpy as np

from covsar_spark.operators.compress import compress_rollup
from covsar_spark.operators.eigen import eigen_rollup
from covsar_spark.operators.fused import eigen_chunks
from covsar_spark.operators.gapfill import gapfill
from covsar_spark.operators.rollup import rollup_tokens, with_event_time

from .conftest import cols_to_spark


def test_fused_equals_unfused(spark, tiny_cols):
    filled = gapfill(
        rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1m"), "1m", "zero"
    )
    fused = eigen_chunks(filled, "1m").toPandas().sort_values(["source", "span_s"]).reset_index(drop=True)
    eig = eigen_rollup(filled, "1m").toPandas().sort_values(["source", "span_s"]).reset_index(drop=True)
    ch = compress_rollup(filled, "1m").toPandas().sort_values(["source", "span_s"]).reset_index(drop=True)
    assert len(fused) == len(eig) == len(ch)
    assert np.array_equal(fused["lam"].to_numpy(), eig["lam"].to_numpy())
    assert np.array_equal(fused["tc"].to_numpy(), eig["tc"].to_numpy())
    for a, b in zip(fused["eig"], eig["eig"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(fused["n_points"].to_numpy(), ch["n_points"].to_numpy())
    for a, b in zip(fused["ts_blob"], ch["ts_blob"]):
        assert bytes(a) == bytes(b)
    for a, b in zip(fused["val_blob"], ch["val_blob"]):
        assert bytes(a) == bytes(b)
