"""Ordered per-key window operators beyond the built-ins.

W1 — true cumulative PRODUCT (the reference's nearest-neighbor phase-linking
seed, covsar/pl/nn.py:5-9: `cumprod` of the coherence superdiagonal). Spark
has no product aggregate, so:

    real form:    prod = sign * exp(sum(log|x|)), sign via the running count
                  of negative factors, hard zero once any factor is 0
    complex form: cumulative product of unit phasors exp(i*phi) = phasor of
                  the running SUM of angles (the angle-cumsum equivalence the
                  reference exploits by working in phase space throughout)

Both are single-pass window aggregates — no UDF, whole-stage codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.complexmath import c_exp, wrap_phase


def cumulative_product(x: Column, w) -> Column:
    """Running product of ``x`` over window spec ``w`` (must be a cumulative
    frame, e.g. rowsBetween(unboundedPreceding, 0)).

    exp(sum(log|x|)) carries the magnitude; the sign is (-1)^(# negative
    factors so far); any zero factor pins the product (and everything after
    it) to exactly 0 — the three cases a log-domain product must split.

    NULL factors are SKIPPED (treated as 1.0): sum() ignores the NULL log
    term and the sign/zero counters score it 0. This is deliberately the
    SQL AGGREGATE convention — DuckDB's windowed product(), the contract
    oracle, ignores NULL rows the same way — and differs from np.cumprod,
    which would poison everything after a NaN. Pinned by
    tests/test_windowfns.py::test_cumulative_product_null_skips_like_sql."""
    n_zero = F.sum(F.when(x == 0.0, 1).otherwise(0)).over(w)
    n_neg = F.sum(F.when(x < 0.0, 1).otherwise(0)).over(w)
    mag = F.exp(F.sum(F.log(F.when(x == 0.0, F.lit(1.0)).otherwise(F.abs(x)))).over(w))
    sign = F.lit(1) - F.lit(2) * F.pmod(n_neg, F.lit(2))
    return F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * mag)


def running_product(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str = "running_prod",
) -> DataFrame:
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, cumulative_product(F.col(value_col), w))


def phase_cumprod(
    df: DataFrame,
    phase_col: str,
    partition_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Complex W1: running product of unit phasors exp(i*phi) as (re, im)
    columns — cumprod(diag(cov, 1)) with |.|=1, covsar/pl/nn.py:5-9. The
    product's angle is the running sum of phases, wrapped to [-pi, pi)."""
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    total = wrap_phase(F.sum(F.col(phase_col)).over(w))
    re, im = c_exp(total)
    return df.withColumn("cum_phase", total).withColumn("cum_re", re).withColumn("cum_im", im)


def unwrap_phase(
    df: DataFrame,
    phase_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str = "unwrapped",
) -> DataFrame:
    """1-D temporal phase unwrapping (np.unwrap semantics): add multiples of
    2*pi so every consecutive difference lands in (-pi, pi]. The reference
    unwraps spatially via the external snaphu binary (covsar/unwrap.py — a
    CLI wrapper, env-gated like geocoding); the time-series engine form is
    the 1-D unwrap of a linked/cumulative phase series along time.

    Pure window algebra, no UDF: wraps crossed at step i is
    k_i = sign(d_i) * ceil((|d_i| - pi) / (2 pi)) — zero on the CLOSED
    interval [-pi, pi] and sign-preserving at odd multiples of pi, exactly
    np.unwrap's tie handling (its one-sided ceil((d - pi)/2pi) form mapped
    d = -pi to a spurious +2pi jump that offset every later value; round-4
    review — reachable because wrap_phase lands on -pi exactly). The
    correction is the running sum -2 pi * cumsum(k); the lag and cumsum
    share one (partition, order) sort-shuffle."""
    import math

    w_order = W.partitionBy(*partition_cols).orderBy(*order_cols)
    w_cum = w_order.rowsBetween(W.unboundedPreceding, 0)
    d = F.col(phase_col) - F.lag(phase_col).over(w_order)
    k = (F.signum(d) * F.ceil((F.abs(d) - math.pi) / (2 * math.pi))).cast("long")
    total_k = F.sum(F.coalesce(k, F.lit(0))).over(w_cum)
    return df.withColumn(out_col, F.col(phase_col) - 2 * math.pi * total_k)
