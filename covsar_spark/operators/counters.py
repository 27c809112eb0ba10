"""Counter and gauge window semantics for the tier engine: reset-aware
counter increase/rate (Prometheus ``increase()``/``rate()``, public
semantics), LOCF time-weighted averages and time-in-state durations
(TimescaleDB ``time_weight`` / ``state_agg``, public semantics), and
open/high/low/close candlestick rollups (TimescaleDB ``ohlc()``), all as
tumbling-window rollups.

Reference analogue: the reference's products are built by differencing a
CUMULATIVE series and windowing the differences — interferograms are
pairwise differences of accumulated phase (covsar/closure_inten.py:181-185)
and velocity maps are per-interval slopes of the cumulative displacement
series (covsar/closure_inten.py:534-551). ``counter_increase`` is the same
"difference a monotone accumulator, then window" motif with the one wrinkle
a 10^12-row telemetry store actually has: the accumulator RESETS when its
producer restarts, and a correct engine must fold the reset into the delta
instead of emitting a huge negative spike.

Exactness: every operator here is pure integer window/aggregate math
(callers scale float inputs to integer units first); sums of int64 are
order-independent, so the DuckDB oracle matches bit-for-bit with a single
terminal float division per output row where one exists at all.

Scale notes (100 TB / 1000 executors):
- ``counter_increase``: ONE shuffle on the series keys for the lag (window
  state = one row per series partition stream), then a map-side partial agg
  into the (keys, window) rollup — the second exchange carries only
  window-level partials.
- ``time_weighted_avg`` / ``state_durations`` / ``ohlc``: every window
  function partitions by (keys, WINDOW) and the aggregation groups on a
  superset of those keys, so each operator is ONE shuffle end to end
  (plan-pinned in tests/test_plans.py) and a series never has to be
  resident on one executor beyond a single tumbling window of samples;
  skewed series salt by window for free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _win(col, tier_s: int):
    return (F.floor(col / tier_s) * tier_s).cast("long")


def counter_increase(
    df: DataFrame,
    counter_col: str,
    keys: Sequence[str] = ("source",),
    ts_col: str = "epoch_s",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """Reset-aware increase per tumbling window over a cumulative counter.

    Per series (``keys``) ordered by ``ts_col`` (+ ``order_cols`` tiebreak),
    the sample-to-sample delta is ``d = c - lag(c)``. A negative delta marks
    a counter RESET (the producer restarted from 0) and contributes the
    post-reset absolute value ``c``; the series' first sample contributes 0
    (no prior observation — extrapolation is out of scope, exactness is in).
    Emits per (keys, window): ``increase`` (sum of deltas attributed to the
    window of each sample's own timestamp), ``n_samples``, ``n_resets``.

    Plan shape (r9 rewrite): the lag is WINDOW-LOCAL — partitioned by
    (keys, window) like the module's other operators — so a series' history
    never sorts in one task (the old ``partitionBy(keys)`` put a hot
    series' full 10^12-row history through a single straggler). Each
    window's first sample gets its delta from a per-(series, window)
    boundary carry: one lag over the AGGREGATED window-level table (one row
    per non-empty window) of the previous window's last counter value —
    sample rows shuffle once on (keys, window); only window-level partials
    shuffle on (keys). Output-identical to the whole-series form (the
    window-local lag plus the carried previous-window last value reproduce
    exactly lag over the full series); oracle unchanged.
    """
    c = F.col(counter_col)
    base = df.select(
        *keys,
        _win(F.col(ts_col), tier_s).alias("epoch_s"),
        F.col(ts_col).alias("_ts"),
        c.alias("_c"),
        *order_cols,
    )
    w = Window.partitionBy(*keys, "epoch_s").orderBy("_ts", *order_cols)
    lagc = F.lag("_c").over(w)
    d = F.col("_c") - lagc
    # window-local contributions; the window's FIRST sample (lagc NULL) is
    # settled below against the previous window's last value
    delta = F.when(lagc.isNull(), F.lit(0)).when(d < 0, F.col("_c")).otherwise(d)
    reset = F.when(lagc.isNull(), F.lit(0)).when(d < 0, F.lit(1)).otherwise(F.lit(0))
    pos = F.struct("_ts", *[F.col(o) for o in order_cols])
    # groupBy on the lag's own partition keys -> the exchange is reused
    # (same shape as time_weighted_avg/state_durations)
    per_win = base.select(
        *keys, "epoch_s", delta.alias("_d"), reset.alias("_r"), "_c", pos.alias("_pos")
    ).groupBy(*keys, "epoch_s").agg(
        F.sum("_d").cast("long").alias("_inc_loc"),
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("_r").cast("long").alias("_res_loc"),
        F.min_by("_c", F.col("_pos")).alias("_first_c"),
        F.max_by("_c", F.col("_pos")).alias("_last_c"),
    )
    # boundary carry: previous non-empty window's last sample, lagged over
    # the TINY window-level table (one row per (series, window))
    ws = Window.partitionBy(*keys).orderBy("epoch_s")
    prev_last = F.lag("_last_c").over(ws)
    db = F.col("_first_c") - prev_last
    first_d = F.when(prev_last.isNull(), F.lit(0)).when(db < 0, F.col("_first_c")).otherwise(db)
    first_r = F.when(prev_last.isNull(), F.lit(0)).when(db < 0, F.lit(1)).otherwise(F.lit(0))
    return per_win.select(
        *keys,
        "epoch_s",
        (F.col("_inc_loc") + first_d).cast("long").alias("increase"),
        "n_samples",
        (F.col("_res_loc") + first_r).cast("long").alias("n_resets"),
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = ("source",),
    ts_us_col: str = "ts_us",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """LOCF time-weighted mean per tumbling window.

    Each sample holds ``value_col`` until the NEXT sample in the same
    window; the window's last sample holds to window end. The first
    sample's weight starts at its own timestamp (no retro-extrapolation),
    so a window's total weight is ``window_end - first_ts`` — windows are
    self-contained and never read neighbouring windows' samples.

    ``value_col`` must already be an integer (scale floats to cents/ppm at
    the call site): ``w_sum = Σ value·dur_us`` and ``dur_us_total`` are then
    exact int64 sums, and ``twa = w_sum / dur_us_total`` is the single float
    step, evaluated once per output row.
    """
    tier_us = tier_s * 1_000_000
    with_win = df.select(
        *keys,
        F.col(ts_us_col).alias("_ts_us"),
        F.col(value_col).alias("_v"),
        *order_cols,
        (F.floor(F.col(ts_us_col) / tier_us) * tier_us).cast("long").alias("_win_us"),
    )
    w = Window.partitionBy(*keys, "_win_us").orderBy("_ts_us", *order_cols)
    next_us = F.lead("_ts_us").over(w)
    dur = F.coalesce(next_us, F.col("_win_us") + tier_us) - F.col("_ts_us")
    # group on the window's OWN partition columns so the exchange the lead()
    # already paid is reused (grouping on a derived epoch_s would re-shuffle)
    return (
        with_win.withColumn("_dur", dur)
        .groupBy(*keys, "_win_us")
        .agg(
            F.sum(F.col("_v") * F.col("_dur")).cast("long").alias("w_sum"),
            F.sum("_dur").cast("long").alias("dur_us_total"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            *keys,
            (F.col("_win_us") / 1_000_000).cast("long").alias("epoch_s"),
            "w_sum",
            "dur_us_total",
            "n_samples",
            (F.col("w_sum") / F.col("dur_us_total")).alias("twa"),
        )
    )


def state_durations(
    df: DataFrame,
    state_col: str,
    keys: Sequence[str] = ("source",),
    ts_us_col: str = "ts_us",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """LOCF time-in-state per tumbling window (TimescaleDB ``state_agg``,
    public semantics): each sample's state HOLDS until the next sample in
    the same window (the last to window end), and the output is the total
    held duration per (keys, window, state) — "how long was each service
    degraded per hour", the query a plain count-per-state gets wrong under
    irregular sampling.

    Same self-contained-window segment math as ``time_weighted_avg`` (the
    weight starts at the window's first sample), all int64. The groupBy
    adds ``state_col`` to the window's own partition keys, so the lead()
    exchange is REUSED — the whole operator is one shuffle."""
    tier_us = tier_s * 1_000_000
    with_win = df.select(
        *keys,
        F.col(ts_us_col).alias("_ts_us"),
        F.col(state_col).alias("state"),
        *order_cols,
        (F.floor(F.col(ts_us_col) / tier_us) * tier_us).cast("long").alias("_win_us"),
    )
    w = Window.partitionBy(*keys, "_win_us").orderBy("_ts_us", *order_cols)
    dur = F.coalesce(F.lead("_ts_us").over(w), F.col("_win_us") + tier_us) - F.col("_ts_us")
    return (
        with_win.withColumn("_dur", dur)
        .groupBy(*keys, "_win_us", "state")
        .agg(
            F.sum("_dur").cast("long").alias("dur_us"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            *keys,
            (F.col("_win_us") / 1_000_000).cast("long").alias("epoch_s"),
            "state",
            "dur_us",
            "n_samples",
        )
    )


def ohlc(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = ("source",),
    ts_col: str = "epoch_s",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """Open/high/low/close candlestick rollup per tumbling window
    (TimescaleDB ``ohlc()``/``candlestick_agg``, public semantics): open =
    the window's first value in (ts, order) order, close = its last, high/
    low = max/min. First/last are ``min_by``/``max_by`` over the (ts,
    order) struct — declarative aggregates, so the WHOLE operator is one
    partial-aggregable groupBy: map-side combine, one exchange, and NO
    per-partition sort (the original row_number() form paid one; the
    plan test pins sortlessness). Ties are broken by ``order_cols``
    making the result replayable."""
    win = (F.floor(F.col(ts_col) / tier_s) * tier_s).cast("long")
    base = df.select(
        *keys,
        win.alias("_win"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
        *order_cols,
    )
    pos = F.struct("_ts", *[F.col(c) for c in order_cols])
    return (
        base.groupBy(*keys, "_win")
        .agg(
            F.min_by("_v", pos).alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max_by("_v", pos).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .withColumnRenamed("_win", "epoch_s")
    )


def heartbeat_coverage(
    df: DataFrame,
    interval_us: int,
    keys: Sequence[str] = ("source",),
    ts_us_col: str = "ts_us",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """Liveness coverage per tumbling window (TimescaleDB ``heartbeat_agg``,
    public semantics): each heartbeat asserts liveness for ``interval_us``
    after itself; the window's covered time is the measure of the UNION of
    those [ts, ts+interval) segments clipped to the window — overlaps from
    fast heartbeats never double-count, and the union needs no interval
    explosion because samples are time-ordered: each heartbeat contributes
    ``min(interval, next_ts − ts)`` (the last one ``min(interval,
    window_end − ts)``), the same ordered-lag sweep the span-dedup coverage
    uses (operators/dedup.py). Emits ``covered_us``, ``n_beats``, ``gaps``
    (count of dead periods ≥ interval between consecutive beats), and
    ``uptime_frac`` — the one terminal float division.

    Window semantics are self-contained like the module's other LOCF ops:
    coverage starts at the window's first beat (a beat in the previous
    window does not reach across — windows stay independently mergeable).
    One shuffle: the lead() window partitions by (keys, WINDOW) and the
    rollup groups on the same keys."""
    tier_us = tier_s * 1_000_000
    with_win = df.select(
        *keys,
        F.col(ts_us_col).alias("_ts_us"),
        *order_cols,
        (F.floor(F.col(ts_us_col) / tier_us) * tier_us).cast("long").alias("_win_us"),
    )
    w = Window.partitionBy(*keys, "_win_us").orderBy("_ts_us", *order_cols)
    nxt = F.lead("_ts_us").over(w)
    reach = F.coalesce(nxt, F.col("_win_us") + tier_us) - F.col("_ts_us")
    covered = F.least(F.lit(int(interval_us)), reach)
    gap = F.when(nxt.isNotNull() & ((nxt - F.col("_ts_us")) >= int(interval_us)), 1).otherwise(0)
    return (
        with_win.withColumn("_cov", covered)
        .withColumn("_gap", gap)
        .groupBy(*keys, "_win_us")
        .agg(
            F.sum("_cov").cast("long").alias("covered_us"),
            F.count(F.lit(1)).alias("n_beats"),
            F.sum("_gap").cast("long").alias("gaps"),
        )
        .select(
            *keys,
            (F.col("_win_us") / 1_000_000).cast("long").alias("epoch_s"),
            "covered_us",
            "n_beats",
            "gaps",
            (F.col("covered_us") / F.lit(float(tier_us))).alias("uptime_frac"),
        )
    )


def ohlc_with_bounds(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = ("source",),
    ts_col: str = "epoch_s",
    order_cols: Sequence[str] = (),
    tier_s: int = 3600,
) -> DataFrame:
    """``ohlc`` plus the (first_ts, first_ord, last_ts, last_ord) bounds
    that make the tier MERGEABLE: open/close of a merged window are the
    open of the earliest sub-window and the close of the latest (ties on
    ts broken by the carried order column), high/low are max/min — so the
    candlestick tier cascades 1m→1h→1d exactly like the sum rollups
    (pinned by tests/test_counters.py cascade==direct). Same sortless
    single-aggregation shape as ``ohlc``."""
    win = (F.floor(F.col(ts_col) / tier_s) * tier_s).cast("long")
    ocol = list(order_cols)
    base = df.select(
        *keys,
        win.alias("_win"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
        *ocol,
    )
    ordc = F.col(ocol[0]) if ocol else F.lit(0)
    pos = F.struct("_ts", ordc.alias("_o"))
    return (
        base.groupBy(*keys, "_win")
        .agg(
            F.min_by("_v", pos).alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max_by("_v", pos).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
            F.min(pos).alias("_first"),
            F.max(pos).alias("_last"),
        )
        .select(
            *keys,
            F.col("_win").alias("epoch_s"),
            "open", "high", "low", "close", "n_samples",
            F.col("_first._ts").alias("first_ts"),
            F.col("_first._o").alias("first_ord"),
            F.col("_last._ts").alias("last_ts"),
            F.col("_last._o").alias("last_ord"),
        )
    )


def ohlc_merge(
    tier: DataFrame, keys: Sequence[str] = ("source",), tier_s: int = 86400
) -> DataFrame:
    """Cascade a bounded OHLC tier (``ohlc_with_bounds`` output) to a
    coarser tier by pure aggregation over the TINY fine-tier table: open =
    min_by over (first_ts, first_ord), close = max_by over (last_ts,
    last_ord), high/low/n by max/min/sum — no raw re-scan, the A7 cascade
    property extended to candlesticks."""
    win = (F.floor(F.col("epoch_s") / tier_s) * tier_s).cast("long")
    return (
        tier.withColumn("_cw", win)
        .groupBy(*keys, "_cw")
        .agg(
            F.min_by("open", F.struct("first_ts", "first_ord")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.struct("last_ts", "last_ord")).alias("close"),
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.min(F.struct("first_ts", "first_ord")).alias("_f"),
            F.max(F.struct("last_ts", "last_ord")).alias("_l"),
        )
        .select(
            *keys,
            F.col("_cw").alias("epoch_s"),
            "open", "high", "low", "close", "n_samples",
            F.col("_f.first_ts").alias("first_ts"),
            F.col("_f.first_ord").alias("first_ord"),
            F.col("_l.last_ts").alias("last_ts"),
            F.col("_l.last_ord").alias("last_ord"),
        )
    )
