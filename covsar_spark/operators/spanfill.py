"""Zero-fill INSIDE the span kernels — shared single-shuffle prep.

The relational path the span kernels (closure correction, eigen, nonlinear
fit, chunk compression) consumed until r9 was::

    gapfill(rollup, tier, "zero")  ->  with_span_bucket  ->  applyInPandas

which materializes the DENSE per-source calendar grid (a grid join + its
exchange) and then shuffles every dense row — at sf0.1 the 100k-row events
rollup explodes to a 2.1M-row dense grid (21x) before the kernel shuffle,
and at a telemetry-sparse 100 TB the amplification is whatever the gap
fraction makes it. This module moves the zero-fill INSIDE the kernel, the
same sentinel construction `tier_kernel` already proved bit-identical to
the relational gapfill (tests/test_tier_kernel.py): sentinels (one row per
(source, span) carrying the source's [lo, hi] grid bounds) UNION the
OBSERVED rollup rows, ONE repartition on (source, span), sort within
partitions, and a mapInPandas carry loop that reindexes each span to its
dense grid in numpy. Only observed rows + one sentinel per span ever
shuffle (guide §8: move small rows, manufacture the dense form where it is
consumed).

Equality obligations (pinned in tests/test_spanfill.py): for every kernel,
`op(gapfill(roll, tier, "zero"), ...)` == `op(roll, ..., fill="zero")`
EXACTLY — same grid (the per-source [lo, hi] lattice clipped to each
span), same series values (observed verbatim, gaps 0.0), same epoch order,
same caps.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EIGEN_SPAN, TIERS


def sentinel_union_prep(
    rollup: DataFrame, tier: str, value_col: str, span: int | None = None
) -> tuple[DataFrame, int, int]:
    """(prep frame, tier_s, span): sentinels ∪ observed rows, repartitioned
    on (source, span_s) and sorted (source, span_s, is_sentinel DESC,
    epoch_s) so each span group arrives contiguous with its sentinel first
    — the exact tier_kernel prep, with a single ``val`` payload column."""
    tier_s = TIERS[tier]
    span = span or EIGEN_SPAN[tier]
    sess = rollup.sparkSession
    n_part = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))

    bounds = rollup.groupBy("source").agg(
        F.min("epoch_s").alias("lo"), F.max("epoch_s").alias("hi")
    )
    sentinels = bounds.select(
        "source",
        F.explode(
            F.sequence((F.floor(F.col("lo") / span) * span).cast("long"), "hi", F.lit(span))
        ).alias("span_s"),
        "lo",
        "hi",
    ).select(
        "source",
        "span_s",
        F.lit(True).alias("is_sentinel"),
        F.col("span_s").alias("epoch_s"),
        "lo",
        "hi",
        F.lit(None).cast("double").alias("val"),
    )
    data = rollup.select(
        "source",
        (F.floor(F.col("epoch_s") / span) * span).cast("long").alias("span_s"),
        F.lit(False).alias("is_sentinel"),
        "epoch_s",
        F.lit(None).cast("long").alias("lo"),
        F.lit(None).cast("long").alias("hi"),
        F.col(value_col).cast("double").alias("val"),
    )
    prep = (
        sentinels.unionByName(data)
        .repartition(n_part, "source", "span_s")
        .sortWithinPartitions("source", "span_s", F.col("is_sentinel").desc(), "epoch_s")
    )
    return prep, tier_s, span


def fill_groups(
    pdf: pd.DataFrame, tier_s: int, span: int
) -> Iterator[tuple[str, int, np.ndarray, np.ndarray]]:
    """Yield (source, span_s, grid, zero-filled series) per span group of a
    contiguous prep frame — the val-only twin of tier_kernel._process's
    reindex (observed values verbatim, gaps 0.0, grid = the source's
    [lo, hi] lattice clipped to the span)."""
    src = pdf["source"].to_numpy()
    spn = pdf["span_s"].to_numpy(np.int64)
    sentinel = pdf["is_sentinel"].to_numpy(bool)
    eps = pdf["epoch_s"].to_numpy(np.int64)
    lo = pdf["lo"].to_numpy()
    hi = pdf["hi"].to_numpy()
    val = pdf["val"].to_numpy(np.float64)

    change = (spn[1:] != spn[:-1]) | (src[1:] != src[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(spn)]])
    for a, b in zip(starts[:-1], starts[1:]):
        s_lo, s_hi = int(lo[a]), int(hi[a])
        sp = int(spn[a])
        g0 = max(sp, s_lo)
        g1 = min(sp + span, s_hi + tier_s)
        grid = np.arange(g0, g1, tier_s, dtype=np.int64)
        v = np.zeros(len(grid), dtype=np.float64)
        d0 = a + (1 if sentinel[a] else 0)
        if b > d0:
            v[(eps[d0:b] - g0) // tier_s] = val[d0:b]
        yield src[a], sp, grid, v


def map_span_groups(
    prep: DataFrame,
    tier_s: int,
    span: int,
    process: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """mapInPandas over the prep stream with the tier_kernel carry loop:
    a span group split across Arrow batch boundaries is carried whole into
    the next batch, so ``process`` always sees complete span groups."""

    def kernel(it):
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            src = pdf["source"].to_numpy()
            spn = pdf["span_s"].to_numpy()
            diff = (spn != spn[-1]) | (src != src[-1])
            last_start = int(np.flatnonzero(diff)[-1] + 1) if diff.any() else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    return prep.mapInPandas(kernel, schema)


def dense_span_kernel(
    rollup: DataFrame,
    tier: str,
    value_col: str,
    batch_fn: Callable[[list, list[np.ndarray], list[np.ndarray]], pd.DataFrame],
    schema,
    span: int | None = None,
) -> DataFrame:
    """One-shuffle zero-filled span kernel: ``batch_fn(keys, grids, series)``
    receives every complete span group of a batch — keys as (source,
    span_s) tuples, grids/series as the dense per-span arrays — and returns
    the output rows as a pandas frame matching ``schema``."""
    prep, tier_s, span = sentinel_union_prep(rollup, tier, value_col, span)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        keys, grids, series = [], [], []
        for s, sp, grid, v in fill_groups(pdf, tier_s, span):
            keys.append((s, sp))
            grids.append(grid)
            series.append(v)
        return batch_fn(keys, grids, series)

    return map_span_groups(prep, tier_s, span, process, schema)
