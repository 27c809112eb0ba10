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
