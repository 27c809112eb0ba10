"""Single-shuffle tier kernel must reproduce the relational pipeline exactly
(gap-filled tier table, eigen rows, codec blobs)."""

from __future__ import annotations

import numpy as np

from covsar_spark.operators.compress import compress_rollup
from covsar_spark.operators.eigen import eigen_rollup
from covsar_spark.operators.gapfill import gapfill
from covsar_spark.operators.rollup import rollup_tokens, with_event_time
from covsar_spark.operators.tier_kernel import split_outputs, tier_kernel

from .conftest import assert_frames_equal, cols_to_spark


def _sorted(df, keys):
    return df.toPandas().sort_values(keys, kind="mergesort").reset_index(drop=True)


def test_tier_kernel_equals_relational(spark, tiny_gappy_cols):
    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_gappy_cols)), "1m")
    k = tier_kernel(roll, "1m")
    filled_k, eig_k, chunks_k = split_outputs(k)

    filled_r = gapfill(roll, "1m", "zero")
    got = _sorted(filled_k, ["source", "epoch_s"])
    exp = _sorted(filled_r, ["source", "epoch_s"])
    assert_frames_equal(
        got, exp, keys=["source", "epoch_s"],
        exact_cols=["source", "epoch_s", "token_count", "n_docs", "max_tok", "min_tok", "filled"],
        float_cols=["rate"],
    )

    eig_r = _sorted(eigen_rollup(filled_r, "1m"), ["source", "span_s"])
    ek = _sorted(eig_k, ["source", "span_s"])
    assert np.array_equal(ek["lam"].to_numpy(), eig_r["lam"].to_numpy())
    assert np.array_equal(ek["tc"].to_numpy(), eig_r["tc"].to_numpy())
    for a, b in zip(ek["eig"], eig_r["eig"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    ch_r = _sorted(compress_rollup(filled_r, "1m"), ["source", "span_s"])
    ck = _sorted(chunks_k, ["source", "span_s"])
    assert np.array_equal(ck["n_points"].to_numpy(), ch_r["n_points"].to_numpy())
    for a, b in zip(ck["ts_blob"], ch_r["ts_blob"]):
        assert bytes(a) == bytes(b)
    for a, b in zip(ck["val_blob"], ch_r["val_blob"]):
        assert bytes(a) == bytes(b)
