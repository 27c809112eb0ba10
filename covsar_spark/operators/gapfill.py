"""Gap-fill of missing acquisition epochs.

Reference analogue: `griddata` interpolation over observed grid nodes
(covsar/interpolate_phase.py:11-76) and the missing-pair edge-dropout model
(covsar/graphs.py:6-46). Engine form (SURVEY.md J7/W4): per-source calendar
`sequence` + `explode` LEFT JOIN observed rollup rows, then a fill policy:

- ``zero``    — counts of nothing are zero (token_count=0, rate=0)
- ``ffill``   — forward-fill rate from the last observed epoch
- ``linear``  — linear interpolation of rate between lag/lead observed epochs
- ``cross``   — fill from OTHER sources observed at the same epoch via a
  multiplicative two-way model (rate ~ source_effect x epoch_effect): the
  cross-series analogue of the reference's 2-D spatial `griddata` fill
  (covsar/interpolate_phase.py:11-76 interpolates a pixel from neighbors in
  an orthogonal dimension; here the orthogonal dimension is the source axis)

Every filled row carries ``filled=true`` lineage.

Scale notes: the calendar side is built from a per-source (min,max) aggregate
— tiny — exploded to one row per grid slot; the join is on (source, epoch_s),
the same key the rollup is already partitioned by, so with matching
partitioning AQE keeps this a local join. The window functions for
ffill/linear partition by source and order by epoch — one shuffle, bounded by
grid size (epochs per source), not raw data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..schemas import TIERS


CHUNK_STEPS = 1440  # grid slots exploded per chunk row


def calendar_grid(rollup: DataFrame, tier: str) -> DataFrame:
    """Per-source dense epoch grid spanning that source's observed range.

    Two-level explode: bounds (one row per source) -> chunk rows of at most
    CHUNK_STEPS slots -> grid slots. A single-level explode would fan a
    multi-week grid out of a handful of bounds rows sitting in one partition
    — zero parallelism on exactly the operator that produces the most rows.
    The chunk explode is repartitioned so slot generation spreads across the
    cluster.
    """
    tier_s = TIERS[tier]
    chunk_s = tier_s * CHUNK_STEPS
    bounds = rollup.groupBy("source").agg(
        F.min("epoch_s").alias("lo"), F.max("epoch_s").alias("hi")
    )
    sess = rollup.sparkSession
    n_part = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    chunks = bounds.select(
        "source",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                (F.floor(F.col("lo") / chunk_s) * chunk_s).cast("long"), "hi", F.lit(chunk_s)
            )
        ).alias("c"),
    ).repartition(n_part)
    # chunk slots live on the SOURCE's lattice lo + k*tier_s, not on absolute
    # multiples of tier_s: for off-lattice inputs (lo % tier_s != 0 — e.g. a
    # grid produced under another anchor) the absolute form shifted every
    # chunk after the first, silently matching zero observed rows (round-4
    # review). off re-anchors each chunk start; the stop carries the same
    # offset so consecutive chunks partition the lattice without gaps.
    off = F.pmod(F.col("lo") - F.col("c"), F.lit(tier_s))
    start = F.greatest(F.col("c") + off, F.col("lo"))
    stop = F.least(F.col("c") + off + (chunk_s - tier_s), F.col("hi"))
    return chunks.select(
        "source",
        F.explode(
            F.when(start <= stop, F.sequence(start, stop, F.lit(tier_s)))
            .otherwise(F.array().cast("array<long>"))
        ).alias("epoch_s"),
    )


def gapfill(rollup: DataFrame, tier: str, policy: str = "zero") -> DataFrame:
    """Densify a tier rollup to the full per-source calendar grid."""
    tier_s = TIERS[tier]
    grid = calendar_grid(rollup, tier)
    j = grid.join(rollup, ["source", "epoch_s"], "left")
    filled = F.col("token_count").isNull()

    base = j.select(
        "source",
        "epoch_s",
        F.coalesce("token_count", F.lit(0)).alias("token_count"),
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        "max_tok",
        "min_tok",
        F.col("rate"),
        filled.alias("filled"),
    )

    if policy == "zero":
        return base.withColumn("rate", F.coalesce("rate", F.lit(0.0)))

    w_past = W.partitionBy("source").orderBy("epoch_s").rowsBetween(W.unboundedPreceding, 0)
    if policy == "ffill":
        return base.withColumn(
            "rate",
            F.coalesce(F.last("rate", ignorenulls=True).over(w_past), F.lit(0.0)),
        )

    if policy == "linear":
        # "next observed" via cumulative last over DESCENDING epoch: an
        # unbounded-FOLLOWING frame would make Spark recompute the aggregate
        # per row (O(n^2) per partition); both frames here are running
        # frames (O(n))
        w_next = (
            W.partitionBy("source")
            .orderBy(F.col("epoch_s").desc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        obs = F.when(~F.col("filled"), F.struct("epoch_s", "rate"))
        prev = F.last(obs, ignorenulls=True).over(w_past)
        nxt = F.last(obs, ignorenulls=True).over(w_next)
        frac = (F.col("epoch_s") - prev["epoch_s"]) / (nxt["epoch_s"] - prev["epoch_s"])
        interp = prev["rate"] + frac * (nxt["rate"] - prev["rate"])
        return base.withColumn(
            "rate",
            F.when(~F.col("filled"), F.col("rate"))
            .when(prev.isNotNull() & nxt.isNotNull(), interp)
            .when(prev.isNotNull(), prev["rate"])
            .when(nxt.isNotNull(), nxt["rate"])
            .otherwise(F.lit(0.0)),
        )

    if policy == "cross":
        # two-way multiplicative fill: rate_hat(source, epoch) =
        # epoch_mean * source_mean / global_mean over OBSERVED rows only.
        # Three aggregates of the observed rollup (per-epoch, per-source,
        # global); the per-epoch table joins the grid on epoch_s, the
        # per-source one on source (AQE broadcasts either when it fits — no
        # forced hint, source cardinality is corpus-dependent). Epochs no
        # source observed fall back to the source mean.
        obs = rollup.select("source", "epoch_s", "rate")
        by_epoch = obs.groupBy("epoch_s").agg(F.avg("rate").alias("_em"))
        by_source = obs.groupBy("source").agg(F.avg("rate").alias("_sm"))
        gm = obs.agg(F.avg("rate").alias("_gm"))
        est = (
            F.col("_em") * F.col("_sm") / F.nullif(F.col("_gm"), F.lit(0.0))
        )
        return (
            base.join(by_epoch, "epoch_s", "left")
            .join(by_source, "source", "left")
            .crossJoin(F.broadcast(gm))
            .withColumn(
                "rate",
                F.when(~F.col("filled"), F.col("rate")).otherwise(
                    F.coalesce(est, F.col("_sm"), F.lit(0.0))
                ),
            )
            .drop("_em", "_sm", "_gm")
        )

    raise ValueError(f"unknown gap-fill policy: {policy}")
