"""Gap-fill policies vs oracle on the F2 gappy fixture."""

from __future__ import annotations

import numpy as np
import pytest

from covsar_spark import oracle
from covsar_spark.datagen import GAPS
from covsar_spark.operators.gapfill import gapfill
from covsar_spark.operators.rollup import rollup_tokens, with_event_time

from .conftest import assert_frames_equal, cols_to_spark


@pytest.mark.parametrize("policy", ["zero", "ffill", "linear", "cross"])
def test_gapfill_policy_matches_oracle(spark, tiny_gappy_cols, policy):
    df = with_event_time(cols_to_spark(spark, tiny_gappy_cols))
    roll = rollup_tokens(df, "1m")
    got = gapfill(roll, "1m", policy).toPandas()
    exp = oracle.gapfill(oracle.rollup(oracle.tokens_frame(tiny_gappy_cols), "1m"), "1m", policy)
    assert_frames_equal(
        got, exp, keys=["source", "epoch_s"],
        exact_cols=["source", "epoch_s", "token_count", "n_docs", "max_tok", "min_tok", "filled"],
        float_cols=["rate"],
    )


def test_gap_windows_are_filled_with_lineage(spark, tiny_gappy_cols):
    """The F2 gaps (books minutes 190-199, web hour 5) come back as
    filled=true zero-count rows on the dense grid."""
    df = with_event_time(cols_to_spark(spark, tiny_gappy_cols))
    filled = gapfill(rollup_tokens(df, "1m"), "1m", "zero").toPandas()
    from covsar_spark.schemas import EPOCH0_UNIX

    for src, rng_ in GAPS:
        sub = filled[filled["source"] == src]
        lo, hi = sub["epoch_s"].min(), sub["epoch_s"].max()
        for minute in rng_:
            e = EPOCH0_UNIX + 60 * minute
            if lo <= e <= hi:
                row = sub[sub["epoch_s"] == e]
                assert len(row) == 1
                assert bool(row["filled"].iloc[0])
                assert int(row["token_count"].iloc[0]) == 0
    # grid is dense per source
    for src, g in filled.groupby("source"):
        eps = np.sort(g["epoch_s"].to_numpy())
        assert np.array_equal(eps, np.arange(eps[0], eps[-1] + 1, 60))


def test_calendar_grid_off_lattice_anchor(spark):
    """Epochs congruent to lo mod tier_s (lo NOT a multiple of tier_s) must
    produce exactly the lo..hi lattice across chunk boundaries — the
    absolute-multiple chunk anchoring shifted every chunk after the first
    (round-4 review)."""
    import pandas as pd

    from covsar_spark.operators.gapfill import CHUNK_STEPS, calendar_grid
    from covsar_spark.schemas import TIERS

    tier_s = TIERS["1m"]
    lo = 1_767_225_600 + 17  # off-lattice anchor
    n = CHUNK_STEPS * 2 + 5  # spans 3 chunks
    epochs = [lo + k * tier_s for k in range(n)]
    pdf = pd.DataFrame({"source": ["a"] * 2, "epoch_s": [epochs[0], epochs[-1]],
                        "token_count": [1, 2]})
    grid = calendar_grid(spark.createDataFrame(pdf), "1m").toPandas()
    got = sorted(grid["epoch_s"].astype(int))
    assert got == epochs, (len(got), len(epochs), got[:3], epochs[:3])
