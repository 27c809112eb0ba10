"""Flagship pipeline composition — the engine's `evd.py` analogue
(covsar/evd.py:84-117: scan -> covariance window agg -> coherence -> eigh ->
quality -> partitioned sink), re-expressed as:

    tokens -> event time -> 1m rollup -> cascade 1h/1d
           -> gap-fill (zero) -> eigen kernel per tier
           -> compressed chunk tables

One raw scan; every tier derives from the previous (continuous aggregates);
the 1m rollup is persisted because three consumers branch from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.compress import compress_rollup
from ..operators.eigen import eigen_rollup
from ..operators.gapfill import gapfill
from ..operators.rollup import cascade, rollup_tokens, with_event_time
from ..schemas import TIERS


def run_tiers(
    tokens: DataFrame,
    policy: str = "zero",
    salt_buckets: int = 0,
    with_eigen: bool = True,
    with_chunks: bool = False,
    persist: bool = True,
) -> dict[str, dict[str, DataFrame]]:
    """Returns per tier: {"rollup", "filled", "eigen"?, "chunks"?}."""
    ts = with_event_time(tokens)
    out: dict[str, dict[str, DataFrame]] = {}
    finer: DataFrame | None = None
    for tier in TIERS:
        roll = rollup_tokens(ts, tier, salt_buckets) if finer is None else cascade(finer, tier)
        if persist:
            roll = roll.persist(StorageLevel.MEMORY_AND_DISK)
        filled = gapfill(roll, tier, policy)
        d: dict[str, DataFrame] = {"rollup": roll, "filled": filled}
        if with_eigen:
            d["eigen"] = eigen_rollup(filled, tier)
        if with_chunks:
            d["chunks"] = compress_rollup(filled, tier)
        out[tier] = d
        finer = roll
    return out


def flagship(tokens: DataFrame) -> DataFrame:
    """One DataFrame joining the 1m rollup quality summary with its eigen
    kernel output — the per-window rolled-up points + dominant-mode metrics."""
    tiers = run_tiers(tokens, with_eigen=True, persist=False)
    filled = tiers["1m"]["filled"]
    eig = tiers["1m"]["eigen"]
    hourly = filled.groupBy(
        "source", (F.floor(F.col("epoch_s") / 3600) * 3600).cast("long").alias("span_s")
    ).agg(
        F.sum("token_count").alias("token_count"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(F.col("filled").cast("long")).alias("n_filled"),
    )
    return hourly.join(eig, ["source", "span_s"], "inner").select(
        "source",
        "span_s",
        "token_count",
        "n_docs",
        "n_filled",
        "n_epochs",
        "lam",
        "tc",
        "eig",
    )
