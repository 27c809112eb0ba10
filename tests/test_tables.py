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


# Skipped-vs-run marker keyed on jar presence (round-6 verdict #8): in this
# image the iceberg-spark-runtime jar is absent so this SKIPS (visible in
# the pytest summary); the first environment that ships the jar — or sets
# $SPARK_GRAFT_ICEBERG_JAR — runs the real catalog-commit path with no code
# change (session.get_spark configures the `covsar` hadoop catalog when the
# probe hits).
import pytest

from covsar_spark.session import iceberg_jar


@pytest.mark.skipif(
    iceberg_jar() is None,
    reason="iceberg-spark-runtime jar not found (SPARK_GRAFT_ICEBERG_JAR unset, "
    "no jar in pyspark/SPARK_HOME jar dirs) — parquet fallback covered above",
)
def test_write_tier_iceberg_catalog_commit(spark, tiny_cols):
    """Real Iceberg path: createOrReplace then append through
    write_tier(table=...), read back via the catalog table."""
    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS covsar.tiers")
    table = "covsar.tiers.tier_1h_test"
    write_tier(roll, path="", tier="1h", mode="overwrite", table=table)
    n = roll.count()
    assert spark.table(table).count() == n
    write_tier(roll, path="", tier="1h", mode="append", table=table)
    assert spark.table(table).count() == 2 * n
    # day partitioning survived the catalog round-trip
    assert "day" in spark.table(table).columns
    spark.sql(f"DROP TABLE {table}")


def test_apply_retention_drops_only_fully_elapsed_days(spark, tiny_cols, tmp_path):
    import json
    import os

    from covsar_spark.sources.tables import apply_retention

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    path = str(tmp_path / "tier_1h")
    write_tier(roll, path, "1h")
    orig = roll.toPandas()
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(days) >= 3, "fixture must span several day partitions"

    # cutoff mid-way through the SECOND day: only day 0 has fully elapsed
    day1 = int(orig["epoch_s"].min()) // 86400
    cutoff = (day1 + 1) * 86400 + 3600
    m = apply_retention(spark, path, cutoff)
    assert m["dropped"] == [days[0]]
    assert m["kept_days"] == len(days) - 1
    assert m["bytes_dropped"] > 0
    left = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert left == days[1:]

    # surviving rows = exactly those at or past the dropped day's end
    back = read_tier(spark, path).toPandas()
    exp = orig[orig["epoch_s"] >= (day1 + 1) * 86400]
    assert len(back) == len(exp)

    # audit manifest written, and invisible to the parquet reader
    man = os.path.join(path, "_retention", f"{m['cutoff_day']}.json")
    assert json.load(open(man))["dropped"] == [days[0]]

    # idempotent
    m2 = apply_retention(spark, path, cutoff)
    assert m2["dropped"] == [] and m2["kept_days"] == len(days) - 1


def test_apply_retention_dry_run_and_policy(spark, tiny_cols, tmp_path):
    import os

    from covsar_spark.sources.tables import apply_retention, apply_retention_policy

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    p1 = str(tmp_path / "t1m")
    p2 = str(tmp_path / "t1d")
    write_tier(roll, p1, "1h")
    write_tier(roll, p2, "1h")
    days = sorted(d for d in os.listdir(p1) if d.startswith("day="))
    orig = roll.toPandas()
    day1 = int(orig["epoch_s"].min()) // 86400
    cutoff = (day1 + 2) * 86400

    dry = apply_retention(spark, p1, cutoff, dry_run=True)
    assert len(dry["dropped"]) == 2
    assert sorted(d for d in os.listdir(p1) if d.startswith("day=")) == days

    res = apply_retention_policy(
        spark,
        {"1m": p1, "1d": p2},
        {"1m": 0, "1d": None},  # 1m: everything before "now" elapses; 1d: keep forever
        now_epoch=cutoff,
    )
    assert res["1d"] == {"skipped": "no horizon"}
    assert res["1m"]["dropped"] == dry["dropped"]
    assert sorted(d for d in os.listdir(p2) if d.startswith("day=")) == days


def test_compact_tier_merges_small_files_preserving_rows(spark, tiny_cols, tmp_path):
    import os

    from covsar_spark.sources.tables import compact_tier

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    path = str(tmp_path / "tier_1h")
    write_tier(roll, path, "1h")
    # simulate streaming appends: several tiny per-batch files per day
    for i in range(3):
        write_tier(roll.limit(40 + i), path, "1h", mode="append")

    def day_files():
        return {
            d: sorted(
                f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
            )
            for d in os.listdir(path)
            if d.startswith("day=")
        }

    before_rows = (
        read_tier(spark, path).toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    before_files = day_files()
    assert all(len(fs) >= 4 for fs in before_files.values())

    m = compact_tier(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert sorted(m["compacted_days"]) == sorted(before_files)
    assert m["files_before"] == sum(len(fs) for fs in before_files.values())

    after_files = day_files()
    assert all(len(fs) == 1 for fs in after_files.values())
    after_rows = (
        read_tier(spark, path).toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    # exact multiset preservation, duplicates from the appends included
    assert len(after_rows) == len(before_rows)
    assert (after_rows["token_count"].to_numpy() == before_rows["token_count"].to_numpy()).all()
    assert (after_rows["epoch_s"].to_numpy() == before_rows["epoch_s"].to_numpy()).all()

    # idempotent: single healthy file per day fails the trigger
    assert compact_tier(spark, path, target_file_bytes=64 * 1024 * 1024)["compacted_days"] == []


def test_compact_day_skips_on_concurrent_append(spark, tiny_cols, tmp_path):
    """A micro-batch file appended between the scan and the commit must
    survive untouched — the day is skipped, nothing deleted (r7 advice)."""
    import os

    from covsar_spark.sources.tables import _compact_day, _day_parquet_listing, _hfs

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    path = str(tmp_path / "tier_1h")
    write_tier(roll, path, "1h")
    write_tier(roll.limit(40), path, "1h", mode="append")
    jvm, _, fs = _hfs(spark, path)
    day = sorted(d for d in os.listdir(path) if d.startswith("day="))[0]
    captured = _day_parquet_listing(jvm, fs, path, day)
    before_rows = len(read_tier(spark, path).toPandas())

    # simulate the race: a new append lands in THIS day AFTER the listing
    # was captured
    from covsar_spark.sources.tables import utc_day

    day_rows = roll.filter(utc_day() == day[4:]).limit(7)
    n_race = day_rows.count()
    assert n_race == 7
    write_tier(day_rows, path, "1h", mode="append")
    live = _day_parquet_listing(jvm, fs, path, day)
    assert set(live) > set(captured)

    res = _compact_day(spark, path, day, captured, 64 * 1024 * 1024)
    assert res["status"] == "skipped_concurrent_write"
    # every pre-race file AND the racing file still present; zero row loss
    assert set(_day_parquet_listing(jvm, fs, path, day)) == set(live)
    assert len(read_tier(spark, path).toPandas()) == before_rows + 7
    assert not os.path.exists(os.path.join(path, "_compact_staging", day))


def test_compact_recovery_completes_interrupted_commit(spark, tiny_cols, tmp_path):
    """Crash after the intent manifest is written but before any file moves:
    the next compact_tier run replays the commit exactly once (staged files
    in, listed inputs out) — rows preserved, no duplicates."""
    import os

    from covsar_spark.sources.tables import (
        _day_parquet_listing,
        _hfs,
        _write_small_json,
        compact_tier,
    )

    roll = rollup_tokens(with_event_time(cols_to_spark(spark, tiny_cols)), "1h")
    path = str(tmp_path / "tier_1h")
    write_tier(roll, path, "1h")
    write_tier(roll.limit(40), path, "1h", mode="append")
    jvm, _, fs = _hfs(spark, path)
    day = sorted(d for d in os.listdir(path) if d.startswith("day="))[0]
    captured = _day_parquet_listing(jvm, fs, path, day)
    expect = (
        read_tier(spark, path)
        .toPandas()
        .sort_values(["source", "epoch_s"])
        .reset_index(drop=True)
    )

    # hand-stage the compacted output (what a crashed run left behind) ...
    staged_dir = os.path.join(path, "_compact_staging", day)
    inputs = [os.path.join(path, day, n) for n in sorted(captured)]
    spark.read.parquet(*inputs).repartition(1).write.mode("overwrite").parquet(staged_dir)
    staged = sorted(f for f in os.listdir(staged_dir) if f.endswith(".parquet"))
    # ... plus the intent manifest, then "crash" before any move/delete
    man = jvm.org.apache.hadoop.fs.Path(path, f"_compaction/{day}.json")
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(path, "_compaction"))
    _write_small_json(fs, man, {"day": day, "inputs": sorted(captured), "staged": staged})

    m = compact_tier(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert m["recovered_days"] == [day]
    # recovery replaced the inputs with the staged file for THAT day
    live = _day_parquet_listing(jvm, fs, path, day)
    assert set(live) == set(staged)
    after = (
        read_tier(spark, path)
        .toPandas()
        .sort_values(["source", "epoch_s"])
        .reset_index(drop=True)
    )
    assert len(after) == len(expect)
    assert (after["token_count"].to_numpy() == expect["token_count"].to_numpy()).all()
    assert not os.path.exists(os.path.join(path, "_compaction", f"{day}.json"))
    assert not os.path.exists(os.path.join(path, "_compact_staging"))


def _dense_tier(spark, n_days=6, n_src=2):
    """Dense 1m tier: per source, one row per minute over n_days — the
    density profile the downsample policy exists for (1440 rows/source/day)."""
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    day0 = 1_700_006_400 - (1_700_006_400 % 86400)  # aligned day start
    for s in range(n_src):
        eps = day0 + 60 * np.arange(n_days * 1440, dtype=np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "source": f"s{s}",
                    "epoch_s": eps,
                    "token_count": rng.integers(0, 5000, len(eps)).astype(np.int64),
                    "rate": rng.random(len(eps)).round(6),
                }
            )
        )
    return pd.concat(rows, ignore_index=True), day0


def test_downsample_tier_rewrites_only_old_days(spark, tmp_path):
    import os

    from covsar_spark.operators.downsample import lttb_indices
    from covsar_spark.sources.tables import downsample_tier

    pdf, day0 = _dense_tier(spark)
    path = str(tmp_path / "tier_1m")
    write_tier(spark.createDataFrame(pdf), path, "1m")
    cutoff = day0 + 3 * 86400  # days 0-2 age out; 3-5 stay raw
    young_days = {d for d in os.listdir(path) if d.startswith("day=")}

    def listing(day):
        return {f for f in os.listdir(os.path.join(path, day)) if f.endswith(".parquet")}

    young_before = {
        d: listing(d) for d in young_days
    }
    res = downsample_tier(spark, path, cutoff, n_out=48, value_col="token_count")
    assert len(res["downsampled_days"]) == 3
    assert res["kept_days"] == 3
    assert res["rows_in"] == 3 * 2 * 1440
    assert res["rows_out"] == 3 * 2 * 48

    # young days byte-untouched
    for d in sorted(young_days):
        if d in res["downsampled_days"]:
            continue
        assert listing(d) == young_before[d], d

    # old days: whole-row LTTB picks, exactly the kernel's choice per series
    back = read_tier(spark, path).toPandas()
    for day_idx in range(3):
        lo = day0 + day_idx * 86400
        g_day = pdf[(pdf.epoch_s >= lo) & (pdf.epoch_s < lo + 86400)]
        got_day = back[(back.epoch_s >= lo) & (back.epoch_s < lo + 86400)]
        for s, g in g_day.groupby("source"):
            g = g.sort_values("epoch_s").reset_index(drop=True)
            idx = lttb_indices(g.epoch_s.to_numpy(np.int64), g.token_count.to_numpy(np.int64), 48)
            want = g.iloc[idx]
            got = got_day[got_day.source == s].sort_values("epoch_s")
            assert got.epoch_s.tolist() == want.epoch_s.tolist(), (day_idx, s)
            # whole rows survive: the non-pick column rides along exactly
            assert got.rate.tolist() == want.rate.tolist(), (day_idx, s)
    # density: raw young days intact
    assert len(back) == 3 * 2 * 1440 + 3 * 2 * 48


def test_downsample_tier_idempotent_and_dry_run(spark, tmp_path):
    import os

    from covsar_spark.sources.tables import downsample_tier

    pdf, day0 = _dense_tier(spark, n_days=4)
    path = str(tmp_path / "tier_1m")
    write_tier(spark.createDataFrame(pdf), path, "1m")
    cutoff = day0 + 2 * 86400

    dry = downsample_tier(spark, path, cutoff, n_out=24, dry_run=True)
    assert len(dry["candidate_days"]) == 2 and not dry["downsampled_days"]

    first = downsample_tier(spark, path, cutoff, n_out=24)
    assert len(first["downsampled_days"]) == 2

    def all_listings():
        out = {}
        for d in os.listdir(path):
            if d.startswith("day="):
                out[d] = sorted(
                    f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
                )
        return out

    before = all_listings()
    second = downsample_tier(spark, path, cutoff, n_out=24)
    assert not second["downsampled_days"]
    assert second["already_days"] == 2
    assert all_listings() == before
