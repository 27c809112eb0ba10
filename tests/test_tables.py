"""Tier-table persistence: layout, round-trip, partition pruning."""

from __future__ import annotations

import numpy as np

from covsar_spark.operators.rollup import rollup_tokens, with_event_time
from covsar_spark.sources.tables import read_tier, write_tier

from .conftest import cols_to_spark


def test_write_read_roundtrip_and_pruning(spark, tiny_cols, tmp_path):
    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    path = str(tmp_path / "tier_1h")
    write_tier(roll, path, "1h")
    back = read_tier(spark, path).toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    orig = roll.toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    assert len(back) == len(orig)
    assert np.array_equal(back["token_count"].to_numpy(), orig["token_count"].to_numpy())

    # day-partition pruning: epoch bound must cut partitions from the scan
    lo = int(orig["epoch_s"].min()) + 86400
    pruned = read_tier(spark, path, lo_epoch=lo)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    got = pruned.toPandas()
    exp = orig[orig["epoch_s"] >= lo]
    assert len(got) == len(exp)
    assert set(map(tuple, got[["source", "epoch_s"]].itertuples(index=False))) == set(
        map(tuple, exp[["source", "epoch_s"]].itertuples(index=False))
    )
