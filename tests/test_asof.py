"""AS-OF join operator vs pandas.merge_asof (independent oracle), both
at-or-before and strict modes, including no-match NULLs and equal-timestamp
ties."""

from __future__ import annotations

import numpy as np
import pandas as pd

from covsar_spark.operators.asof import asof_join


def _fixture():
    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 400),
            "lt": rng.integers(0, 1000, 400).astype(np.int64),
            "lid": np.arange(400, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 60),
            "rt": rng.integers(0, 1000, 60).astype(np.int64),
            "payload": rng.integers(0, 10**6, 60).astype(np.int64),
        }
    ).drop_duplicates(["k", "rt"])
    return left, right


def _pandas_asof(left, right, strict):
    out = []
    for k, lg in left.groupby("k"):
        rg = right[right["k"] == k].sort_values("rt")
        m = pd.merge_asof(
            lg.sort_values("lt"),
            rg[["rt", "payload"]],
            left_on="lt",
            right_on="rt",
            direction="backward",
            allow_exact_matches=not strict,
        )
        out.append(m)
    return pd.concat(out).sort_values("lid").reset_index(drop=True)


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _fixture()
    # duplicate timestamps on the left + at least one exact tie
    left.loc[0, "lt"] = right.iloc[0]["rt"]
    left.loc[0, "k"] = right.iloc[0]["k"]
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    for strict in (False, True):
        got = (
            asof_join(sl, sr, on="k", left_t="lt", right_t="rt",
                      payload=["payload"], strict=strict)
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = _pandas_asof(left, right, strict)
        np.testing.assert_array_equal(
            got["asof_t"].to_numpy(np.float64), want["rt"].to_numpy(np.float64)
        )
        np.testing.assert_array_equal(
            got["asof_payload"].to_numpy(np.float64), want["payload"].to_numpy(np.float64)
        )


def test_range_join_matches_brute_force(spark):
    from covsar_spark.operators.asof import range_join

    rng = np.random.default_rng(31)
    pts = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 300),
            "t": rng.integers(0, 5000, 300).astype(np.int64),
            "pid": np.arange(300, dtype=np.int64),
        }
    )
    iv = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b"],
            "lo": np.array([0, 2000, 100, 900, 4000], dtype=np.int64),
            "hi": np.array([500, 4100, 800, 3900, 4500], dtype=np.int64),
            "ivid": np.arange(5, dtype=np.int64),
        }
    )
    want = pts.merge(iv, on="k")
    want = want[(want["t"] >= want["lo"]) & (want["t"] < want["hi"])]
    want_pairs = set(zip(want["pid"].astype(int), want["ivid"].astype(int)))
    for bucket in (100, 1000, 7777):  # fan-out must not change semantics
        got = range_join(
            spark.createDataFrame(pts), spark.createDataFrame(iv),
            on="k", t="t", lo="lo", hi="hi", bucket_s=bucket,
        ).toPandas()
        got_pairs = set(zip(got["pid"].astype(int), got["ivid"].astype(int)))
        assert got_pairs == want_pairs, bucket
    # left mode: unmatched points survive with NULLs
    left = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        on="k", t="t", lo="lo", hi="hi", bucket_s=1000, how="left",
    ).toPandas()
    assert len(left) >= len(pts)
    matched_pids = {p for p, _ in want_pairs}
    null_rows = left[left["lo"].isna()]
    assert set(null_rows["pid"].astype(int)) == set(pts["pid"].astype(int)) - matched_pids


def test_range_join_left_null_safe(spark):
    """A MATCHED point row carrying a NULL column must not be re-emitted as a
    NULL-padded 'unmatched' row: the anti-join recovering unmatched points
    compares with <=> (plain equality never matches NULL to itself)."""
    from covsar_spark.operators.asof import range_join
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("t", T.LongType()),
            T.StructField("pid", T.LongType()),
            T.StructField("note", T.StringType()),
        ]
    )
    pts = spark.createDataFrame(
        [("a", 10, 0, None), ("a", 9999, 1, None), ("a", 20, 2, "x")], schema
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "lo": np.array([0], np.int64),
                      "hi": np.array([100], np.int64), "ivid": np.array([0], np.int64)})
    )
    got = range_join(pts, iv, on="k", t="t", lo="lo", hi="hi", bucket_s=50, how="left").toPandas()
    # pid 0 (NULL note, matched) exactly once; pid 1 unmatched once; pid 2 once
    assert len(got) == 3
    counts = got["pid"].value_counts()
    assert counts.to_dict() == {0: 1, 1: 1, 2: 1}
    assert got[got["pid"] == 1]["ivid"].isna().all()
    assert got[got["pid"] == 0]["ivid"].notna().all()


def test_range_join_not_nested_loop(spark):
    from covsar_spark.operators.asof import range_join

    pts = pd.DataFrame({"k": ["a"], "t": [1], "pid": [0]})
    iv = pd.DataFrame({"k": ["a"], "lo": [0], "hi": [10], "ivid": [0]})
    plan = (
        range_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                   on="k", t="t", lo="lo", hi="hi", bucket_s=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoopJoin" not in plan


def test_asof_single_exchange_no_join(spark):
    left, right = _fixture()
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    plan = (
        asof_join(sl, sr, on="k", left_t="lt", right_t="rt", payload=["payload"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window, never a theta join
    assert "NestedLoopJoin" not in plan


def test_nearest_point_join_matches_numpy(spark):
    """1-NN argmin semantics vs a direct numpy oracle, including ties
    (equal dist2 -> smallest candidate id wins)."""
    import numpy as np
    import pandas as pd

    from covsar_spark.operators.asof import nearest_point_join

    rng = np.random.default_rng(3)
    n = 200
    cx, cy = rng.integers(0, 50, n), rng.integers(0, 50, n)  # small grid forces ties
    qx, qy = rng.integers(0, 50, 6), rng.integers(0, 50, 6)
    cand = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "x": cx.astype(np.int64), "y": cy.astype(np.int64)})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(6, dtype=np.int64), "x": qx.astype(np.int64), "y": qy.astype(np.int64)})
    )
    got = nearest_point_join(cand, qs).toPandas().set_index("query_id").sort_index()
    for q in range(6):
        d2 = (cx - qx[q]) ** 2 + (cy - qy[q]) ** 2
        best = min(range(n), key=lambda i: (d2[i], i))
        assert got.loc[q, "nn_id"] == best
        assert got.loc[q, "dist2"] == d2[best]


def test_asof_join_null_payload_not_stale(spark):
    """Round-4 review finding: a matched right row whose payload is NULL
    must yield NULL (the matched row's own value), never a stale payload
    from an older right row — DuckDB ASOF JOIN semantics."""
    import pandas as pd

    from covsar_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [10, 20], "p": [5.0, None]})
    )
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "lt": [25]}))
    out = asof_join(left, right, on="k", left_t="lt", right_t="t", payload=["p"]).toPandas()
    assert len(out) == 1
    assert int(out.loc[0, "asof_t"]) == 20  # matched the t=20 row...
    assert pd.isna(out.loc[0, "asof_p"])  # ...and kept ITS null payload


def test_asof_join_fractional_timestamps(spark):
    """No long-cast truncation: right t=2.7 must NOT match left t=2.5."""
    import pandas as pd

    from covsar_spark.operators.asof import asof_join

    right = spark.createDataFrame(pd.DataFrame({"k": ["a", "a"], "t": [1.5, 2.7], "p": [1.0, 2.0]}))
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "lt": [2.5]}))
    out = asof_join(left, right, on="k", left_t="lt", right_t="t", payload=["p"]).toPandas()
    assert out.loc[0, "asof_t"] == 1.5 and out.loc[0, "asof_p"] == 1.0


def test_range_join_fractional_and_empty_intervals(spark):
    """The last partial bucket of a fractional interval must match, and an
    empty/inverted interval explodes to zero rows (not a descending seq)."""
    import pandas as pd

    from covsar_spark.operators.asof import range_join

    pts = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [100.2, 89.0], "pid": [1, 2]})
    )
    # second interval is inverted (hi < lo): must produce zero rows
    iv = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "lo": [90.0, 200.0], "hi": [100.5, 150.0], "iid": ["i1", "i2"]})
    )
    out = range_join(pts, iv, on="k", t="t", lo="lo", hi="hi", bucket_s=10).toPandas()
    # t=100.2 in [90, 100.5): matched via the partial bucket 10
    assert set(zip(out["pid"], out["iid"])) == {(1, "i1")}
