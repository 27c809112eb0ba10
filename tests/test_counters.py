"""Reset-aware counter increase + LOCF time-weighted average
(operators/counters.py) vs explicit-loop references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from covsar_spark.operators.counters import counter_increase, time_weighted_avg

TIER = 3600


@pytest.fixture(scope="module")
def series(spark):
    """Deterministic multi-series counter samples with planted resets:
    per series, the counter accumulates positive integer steps and restarts
    from a small remainder whenever the sample index crosses a reset slot
    (including a reset to a LOWER-but-nonzero value — the case a naive
    `delta = max(d, 0)` gets wrong). Timestamps land irregularly, with some
    exactly on window boundaries and one window left empty per series."""
    rng = np.random.default_rng(7)
    rows = []
    for s, (n, reset_every) in enumerate([(97, 23), (61, 17), (5, 999)]):
        key = f"ser{s}"
        t = 0
        c = 0
        for i in range(n):
            t += int(rng.integers(30, 400))
            if t // TIER == 2:  # hole: skip window 2 entirely
                t = 3 * TIER + (t % TIER)
            if i > 0 and i % reset_every == 0:
                c = int(rng.integers(0, 5))  # restart near zero
            else:
                c += int(rng.integers(1, 50))
            rows.append((key, t, c, i))
    # a boundary sample exactly at a window start
    rows.append(("ser0", 4 * TIER, rows[-1][2] + 7, 999))
    pdf = pd.DataFrame(rows, columns=["source", "epoch_s", "counter", "event_id"])
    return spark.createDataFrame(pdf), pdf


def _ref_increase(pdf: pd.DataFrame) -> dict:
    out = {}
    for key, g in pdf.groupby("source"):
        g = g.sort_values(["epoch_s", "event_id"], kind="mergesort")
        prev = None
        for _, r in g.iterrows():
            w = (r.epoch_s // TIER) * TIER
            slot = out.setdefault((key, w), [0, 0, 0])
            if prev is None:
                d, reset = 0, 0
            elif r.counter - prev < 0:
                d, reset = r.counter, 1
            else:
                d, reset = r.counter - prev, 0
            slot[0] += d
            slot[1] += 1
            slot[2] += reset
            prev = r.counter
    return out


def test_counter_increase_matches_loop(spark, series):
    df, pdf = series
    got = counter_increase(
        df, "counter", keys=("source",), ts_col="epoch_s", order_cols=("event_id",), tier_s=TIER
    ).toPandas()
    want = _ref_increase(pdf)
    assert len(got) == len(want)
    n_resets_total = 0
    for _, r in got.iterrows():
        inc, n, resets = want[(r.source, r.epoch_s)]
        assert (r.increase, r.n_samples, r.n_resets) == (inc, n, resets), (r.source, r.epoch_s)
        n_resets_total += resets
    assert n_resets_total >= 2  # the fixture really exercises resets


def test_counter_increase_totals_telescope(spark, series):
    """Within any reset-free stretch the increases telescope: summing the
    per-window increases over a whole series equals (last - first) plus the
    reset corrections — checked via the loop reference's own construction,
    and independently: a strictly monotone series' total increase is
    exactly last - first."""
    pdf = pd.DataFrame(
        {
            "source": ["m"] * 50,
            "epoch_s": np.arange(50) * 500,
            "counter": np.cumsum(np.arange(1, 51)),
            "event_id": np.arange(50),
        }
    )
    got = counter_increase(
        spark.createDataFrame(pdf), "counter", order_cols=("event_id",), tier_s=TIER
    ).toPandas()
    assert int(got.increase.sum()) == int(pdf.counter.iloc[-1] - pdf.counter.iloc[0])
    assert int(got.n_resets.sum()) == 0


def _ref_twa(pdf: pd.DataFrame, tier_us: int) -> dict:
    out = {}
    for (key, w), g in pdf.groupby(["source", pdf.ts_us // tier_us * tier_us]):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = g.ts_us.to_numpy()
        v = g.v.to_numpy()
        dur = np.diff(np.append(ts, w + tier_us))
        out[(key, w // 1_000_000)] = (int((v * dur).sum()), int(dur.sum()), len(g))
    return out


@pytest.fixture(scope="module")
def gauge(spark):
    rng = np.random.default_rng(11)
    rows = []
    for s in range(3):
        t = 0
        for i in range(140):
            t += int(rng.integers(1, 25 * 60)) * 1_000_000 + int(rng.integers(0, 1_000_000))
            rows.append((f"g{s}", t, int(rng.integers(-500, 5000)), i))
    # exact boundary landing + a single-sample window at the far end
    rows.append(("g0", 50 * 3600 * 1_000_000, 42, 998))
    pdf = pd.DataFrame(rows, columns=["source", "ts_us", "v", "event_id"])
    return spark.createDataFrame(pdf), pdf


def test_time_weighted_avg_matches_loop(spark, gauge):
    df, pdf = gauge
    got = time_weighted_avg(
        df, "v", keys=("source",), ts_us_col="ts_us", order_cols=("event_id",), tier_s=TIER
    ).toPandas()
    want = _ref_twa(pdf, TIER * 1_000_000)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ws, dt, n = want[(r.source, r.epoch_s)]
        assert (r.w_sum, r.dur_us_total, r.n_samples) == (ws, dt, n), (r.source, r.epoch_s)
        assert r.twa == ws / dt


def test_twa_constant_series_is_constant(spark):
    """LOCF invariant: a constant-valued series has TWA == that constant in
    every window regardless of sample spacing."""
    pdf = pd.DataFrame(
        {
            "source": ["c"] * 30,
            "ts_us": (np.cumsum(np.geomspace(1e5, 9e8, 30)).astype(np.int64)),
            "v": [777] * 30,
            "event_id": np.arange(30),
        }
    )
    got = time_weighted_avg(
        spark.createDataFrame(pdf), "v", order_cols=("event_id",)
    ).toPandas()
    assert (got.twa == 777.0).all()


def test_twa_two_point_hand_case(spark):
    """One window, two samples: v=10 for 1/4 of the remaining span, v=20 to
    window end. TWA = (10*1 + 20*3)/4 = 17.5 over the observed span."""
    tier_us = TIER * 1_000_000
    rows = [("h", 0, 10, 0), ("h", tier_us // 4, 20, 1)]
    pdf = pd.DataFrame(rows, columns=["source", "ts_us", "v", "event_id"])
    got = time_weighted_avg(
        spark.createDataFrame(pdf), "v", order_cols=("event_id",)
    ).toPandas()
    assert len(got) == 1
    assert got.twa.iloc[0] == 17.5
    assert int(got.dur_us_total.iloc[0]) == tier_us


# ---------------------------------------------------------------------------
# state_durations + ohlc (TimescaleDB state_agg / candlestick semantics)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gauge_states(spark):
    """Irregular samples with a small state domain; some windows hold only
    one state, some flip every sample, one window is empty."""
    rng = np.random.default_rng(13)
    rows = []
    for s in range(3):
        t = 0
        for i in range(150):
            t += int(rng.integers(5, 900)) * 1_000_000
            if t // (TIER * 1_000_000) == 1:  # hole: window 1 empty
                t += TIER * 1_000_000
            rows.append((f"g{s}", t, int(rng.integers(0, 4)), int(rng.integers(0, 10_000)), i))
    pdf = pd.DataFrame(rows, columns=["source", "ts_us", "state", "val", "ord"])
    return spark.createDataFrame(pdf), pdf


def _ref_state_durations(pdf: pd.DataFrame) -> dict:
    tier_us = TIER * 1_000_000
    out = {}
    for key, g in pdf.groupby("source"):
        g = g.sort_values(["ts_us", "ord"], kind="mergesort").reset_index(drop=True)
        for i, r in g.iterrows():
            w = (r.ts_us // tier_us) * tier_us
            nxt = g.ts_us[i + 1] if i + 1 < len(g) and (g.ts_us[i + 1] // tier_us) * tier_us == w else w + tier_us
            slot = out.setdefault((key, w // 1_000_000, r.state), [0, 0])
            slot[0] += int(nxt - r.ts_us)
            slot[1] += 1
    return out


def test_state_durations_matches_loop(spark, gauge_states):
    from covsar_spark.operators.counters import state_durations

    sdf, pdf = gauge_states
    got = state_durations(sdf, "state", keys=("source",), ts_us_col="ts_us",
                          order_cols=("ord",), tier_s=TIER).toPandas()
    want = _ref_state_durations(pdf)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        dur, n = want[(r.source, r.epoch_s, r.state)]
        assert (int(r.dur_us), int(r.n_samples)) == (dur, n), (r.source, r.epoch_s, r.state)


def test_state_durations_sum_to_window_weight(spark, gauge_states):
    """Per (source, window): state durations partition the TWA weight —
    their sum equals window_end - first_sample_ts exactly."""
    from covsar_spark.operators.counters import state_durations

    sdf, pdf = gauge_states
    got = state_durations(sdf, "state", keys=("source",), ts_us_col="ts_us",
                          order_cols=("ord",), tier_s=TIER).toPandas()
    tier_us = TIER * 1_000_000
    tot = got.groupby(["source", "epoch_s"])["dur_us"].sum()
    for (src, w), dur in tot.items():
        g = pdf[(pdf.source == src) & (pdf.ts_us // tier_us * tier_us == w * 1_000_000)]
        assert dur == w * 1_000_000 + tier_us - int(g.ts_us.min())


def _ref_ohlc(pdf: pd.DataFrame) -> dict:
    out = {}
    for key, g in pdf.groupby("source"):
        for w, gw in g.groupby((g.epoch_s // TIER) * TIER):
            gw = gw.sort_values(["epoch_s", "ord"], kind="mergesort")
            out[(key, w)] = (
                int(gw.val.iloc[0]), int(gw.val.max()), int(gw.val.min()),
                int(gw.val.iloc[-1]), len(gw),
            )
    return out


def test_ohlc_matches_loop(spark, gauge_states):
    from covsar_spark.operators.counters import ohlc

    sdf, pdf = gauge_states
    pdf = pdf.assign(epoch_s=pdf.ts_us // 1_000_000)
    got = ohlc(spark.createDataFrame(pdf), "val", keys=("source",),
               ts_col="epoch_s", order_cols=("ord",), tier_s=TIER).toPandas()
    want = _ref_ohlc(pdf)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        o, h, lo, c, n = want[(r.source, r.epoch_s)]
        assert (r.open, r.high, r.low, r.close, r.n_samples) == (o, h, lo, c, n)


def test_ohlc_tie_on_timestamp_breaks_by_order(spark):
    from covsar_spark.operators.counters import ohlc

    pdf = pd.DataFrame(
        {"source": "x", "epoch_s": [100, 100, 100], "val": [5, 9, 2], "ord": [2, 0, 1]}
    )
    got = ohlc(spark.createDataFrame(pdf), "val", keys=("source",),
               ts_col="epoch_s", order_cols=("ord",), tier_s=TIER).toPandas()
    assert got.iloc[0][["open", "high", "low", "close"]].tolist() == [9, 9, 2, 5]


def _ref_heartbeat(pdf: pd.DataFrame, interval_us: int) -> dict:
    """Brute interval-union reference: per (source, window) merge the
    sorted [ts, min(ts+interval, win_end)) segments explicitly."""
    tier_us = TIER * 1_000_000
    out = {}
    for key, g in pdf.groupby("source"):
        for w, gw in g.groupby((g.ts_us // tier_us) * tier_us):
            ts = sorted(gw.ts_us.tolist())
            segs = [(t, min(t + interval_us, w + tier_us)) for t in ts]
            covered, cur_lo, cur_hi = 0, None, None
            for lo, hi in segs:
                if cur_hi is None or lo > cur_hi:
                    if cur_hi is not None:
                        covered += cur_hi - cur_lo
                    cur_lo, cur_hi = lo, hi
                else:
                    cur_hi = max(cur_hi, hi)
            if cur_hi is not None:
                covered += cur_hi - cur_lo
            gaps = sum(1 for a, b in zip(ts, ts[1:]) if b - a >= interval_us)
            out[(key, w // 1_000_000)] = (covered, len(ts), gaps)
    return out


def test_heartbeat_coverage_matches_interval_union(spark, gauge_states):
    from covsar_spark.operators.counters import heartbeat_coverage

    sdf, pdf = gauge_states
    interval = 600 * 1_000_000
    got = heartbeat_coverage(sdf, interval, keys=("source",), ts_us_col="ts_us",
                             order_cols=("ord",), tier_s=TIER).toPandas()
    want = _ref_heartbeat(pdf, interval)
    assert len(got) == len(want)
    overlapped = dead = 0
    for _, r in got.iterrows():
        cov, n, gaps = want[(r.source, r.epoch_s)]
        assert (int(r.covered_us), int(r.n_beats), int(r.gaps)) == (cov, n, gaps)
        assert abs(r.uptime_frac - cov / (TIER * 1e6)) < 1e-12
        overlapped += int(cov < min(n * interval, TIER * 1_000_000))
        dead += int(gaps > 0)
    # the fixture must exercise both overlap-dedup and dead periods
    assert overlapped > 5 and dead > 5


def test_heartbeat_coverage_hand_case(spark):
    from covsar_spark.operators.counters import heartbeat_coverage

    us = 1_000_000
    base = (1_700_000_000 // TIER) * TIER * us
    # beats at +0s, +5s (overlap), +100s (gap), +3590s (clipped by window end)
    pdf = pd.DataFrame({"source": "h", "ts_us": np.array(
        [base, base + 5 * us, base + 100 * us, base + 3590 * us], dtype=np.int64),
        "ord": np.arange(4, dtype=np.int64)})
    got = heartbeat_coverage(spark.createDataFrame(pdf), 30 * us, keys=("source",),
                             ts_us_col="ts_us", order_cols=("ord",), tier_s=TIER).toPandas()
    # union: [0,35) ∪ [100,130) ∪ [3590,3600) = 35 + 30 + 10 = 75 s
    assert got.covered_us.tolist() == [75 * us]
    assert got.gaps.tolist() == [2]  # 5→100 and 100→3590
    assert got.n_beats.tolist() == [4]


def test_ohlc_cascade_equals_direct(spark, gauge_states):
    """Candlestick tiers cascade: merging the hourly bounded-OHLC tier to
    daily equals the direct daily build exactly — merge is min_by/max_by
    on the carried (ts, ord) bounds, never a raw re-scan."""
    from covsar_spark.operators.counters import ohlc_merge, ohlc_with_bounds

    sdf, pdf = gauge_states
    pts = sdf.selectExpr("source", "CAST(ts_us / 1000000 AS BIGINT) AS epoch_s", "val", "ord")
    hourly = ohlc_with_bounds(pts, "val", keys=("source",), ts_col="epoch_s",
                              order_cols=("ord",), tier_s=TIER)
    daily_direct = (
        ohlc_with_bounds(pts, "val", keys=("source",), ts_col="epoch_s",
                         order_cols=("ord",), tier_s=24 * TIER)
        .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    daily_cascaded = (
        ohlc_merge(hourly, keys=("source",), tier_s=24 * TIER)
        .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    assert len(daily_direct) == len(daily_cascaded) > 0
    for c in ("source", "epoch_s", "open", "high", "low", "close", "n_samples",
              "first_ts", "first_ord", "last_ts", "last_ord"):
        assert daily_direct[c].tolist() == daily_cascaded[c].tolist(), c


def test_ohlc_with_bounds_agrees_with_ohlc(spark, gauge_states):
    from covsar_spark.operators.counters import ohlc, ohlc_with_bounds

    sdf, _ = gauge_states
    pts = sdf.selectExpr("source", "CAST(ts_us / 1000000 AS BIGINT) AS epoch_s", "val", "ord")
    a = (ohlc(pts, "val", keys=("source",), ts_col="epoch_s", order_cols=("ord",), tier_s=TIER)
         .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True))
    b = (ohlc_with_bounds(pts, "val", keys=("source",), ts_col="epoch_s", order_cols=("ord",), tier_s=TIER)
         .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True))
    for c in ("source", "epoch_s", "open", "high", "low", "close", "n_samples"):
        assert a[c].tolist() == b[c].tolist(), c
