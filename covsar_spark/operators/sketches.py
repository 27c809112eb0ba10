"""Mergeable sketch aggregates for continuous rollups: HyperLogLog distinct
counts and HDR-histogram quantiles, both CASCADABLE across retention tiers.

The reference's tier outputs are all exact aggregates (sums/counts/means,
covsar/closure_inten.py epoch rollups); at 10^12-sequence scale the two
aggregates every telemetry/retention engine also needs — distinct counts
and quantiles — cannot be cascaded exactly (distinct and percentile are not
associative). The engine answer is mergeable sketches whose MERGE IS an
associative built-in aggregate, so the 1m→1h→1d cascade path (A7,
operators/rollup.py cascade) applies to them unchanged:

  * HyperLogLog (Flajolet et al. 2007): per-window register table, merge =
    MAX per register. m=256 registers (p=8, std err ~6.5%).
  * HDR histogram (HdrHistogram's log2-bucket + linear-subbucket layout,
    here 4 sub-bucket bits → quantile relative error ≤ 1/16): per-window
    bucket counts, merge = SUM per bucket.

Everything is INTEGER arithmetic in JVM-side built-ins (no UDFs, no
float-log bucketing): the hash is the repo's shared md5→int lift
(conv(substr(md5(x),1,10),16,10), ≤2^40 so DuckDB's ('0x'||…)::BIGINT
replays it), and floor(log2(x)) is length(bin(x))-1 — a string op on an
integer, bit-identical in Spark and DuckDB, immune to the libm last-ulp
trap a float log2 would carry near power-of-two boundaries. The bucket
math lives in SQL fragment builders SHARED VERBATIM by the Spark plan
(F.expr) and the DuckDB oracle (covsar_spark/contract.py), so the two
sides cannot drift. The only float steps are the final HLL estimator
(dyadic 2^-M sums are exact in float64; the ln() in the linear-counting
branch is absorbed by 4dp rounding) — hence the whole pipeline, cascade
included, carries an EXACT cross-engine oracle, not an approximate one.

Scale shape: raw→register/bucket aggregation is one map-side-combinable
shuffle keyed (window, register|bucket); the cascade reads only the finer
tier's sketch table (tiny: windows × ≤256 rows) — the raw table is scanned
once per tier chain, exactly like the rollup cascade. The per-window
estimator/quantile pass groups a few hundred rows per window; the cum-sum
window partitions by day over ≤~200 bucket rows (not the
whole-partition-window trap class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

# HLL geometry: p=8 → m=256 registers from the low 8 bits of a 40-bit
# md5-derived hash; the remaining q=32 bits feed the rank (leading-zero
# count + 1, i.e. 33 - bit_length(w), with w=0 → rank q+1=33).
HLL_M = 256
HLL_Q = 32
# HDR geometry: values lift to integers at 2 decimals (floor(v*100));
# buckets are exact below v_int=32, width ≤ lower_bound/16 above.
HDR_SCALE = 100
HDR_SUB_BITS = 4


def hll_reg_sql(h: str) -> str:
    """Register index from a 40-bit integer hash expression (dialect-shared)."""
    return f"(({h}) & {HLL_M - 1})"


def hll_rank_sql(h: str) -> str:
    """Rank from a 40-bit integer hash expression (dialect-shared): the
    leading-zero count of the top 32 bits plus one, via bin-length."""
    w = f"(({h}) >> 8)"
    return f"(CASE WHEN {w} = 0 THEN {HLL_Q + 1} ELSE {HLL_Q + 1} - length(bin({w})) END)"


def hdr_index_sql(v: str) -> str:
    """HDR bucket index of a positive integer expression (dialect-shared):
    identity below 32, else 32 + 16·(bit_length−6) + the 4 bits after the
    leading 1. Pure integer ops (bin/>>/&)."""
    b = f"length(bin({v}))"
    return (
        f"(CASE WHEN {v} < 32 THEN {v}"
        f" ELSE 32 + ({b} - 6) * 16 + ((({v}) >> ({b} - {HDR_SUB_BITS + 1})) & 15) END)"
    )


def hdr_lower_sql(i: str) -> str:
    """Inverse of hdr_index_sql: the bucket's inclusive lower bound.

    Integer division is spelled floor(x/16.0) because the dialects disagree
    on `/` (both widen to DOUBLE) but CAST rounds in DuckDB and truncates
    in Spark; floor of an exact small quotient is identical in both."""
    e = f"CAST(floor((({i}) - 32) / 16.0) AS INT)"
    return (
        f"(CASE WHEN {i} < 32 THEN {i}"
        f" ELSE (16 + (({i}) - 32) % 16) << ({e} + 1) END)"
    )


def _spark_hash40(col: str) -> str:
    return f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 10), 16, 10) AS BIGINT)"


def hll_estimate(registers: DataFrame, group_cols: list[str], m: int = HLL_M) -> DataFrame:
    """Estimator over a register table (group_cols…, reg, m_rank).

    Standard HLL: alpha·m²/Σ2^−M with absent registers contributing 2⁰,
    linear-counting fallback m·ln(m/V) when the raw estimate ≤ 2.5m and
    V>0. The 2^−M sum is exact float64 (dyadic, ≥2^−33, <2^8); the branch
    compares the raw estimate ROUNDED to 6dp so a last-ulp wobble cannot
    flip engines onto different branches; the final value rounds to 4dp
    (absorbs the ln ulp) — hence SQL-replayable bit-for-bit.
    """
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = registers.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("sumpow"),
    )
    e_raw = F.lit(alpha * m * m) / ((F.lit(m) - F.col("present")) + F.col("sumpow"))
    v = (F.lit(m) - F.col("present")).cast("long")
    est = F.when(
        (F.round(e_raw, 6) <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return g.select(
        *group_cols,
        F.col("present").cast("long").alias("present"),
        (F.round(est, 4) + F.lit(0.0)).alias("est"),
    )


def hll_daily_cascade(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-day distinct-key HLL, computed BOTH ways — directly from raw rows
    and by cascading hourly register tables through a per-register MAX (the
    tier path: the same associative merge serves 1m→1h→1d and any longer
    chain) — plus the exact distinct count for visible calibration. The two
    estimates are bitwise equal by construction (max is associative); both
    are emitted so the driver hash pins the cascade implementation, not
    just the algebra. Shuffles: one (day,hour,reg) map-side-combined agg,
    one (day,reg) merge over the tiny register table, one per-day
    estimator pass; the direct leg re-scans raw only to prove parity.
    """
    h = _spark_hash40(key)
    keyed = events.selectExpr(
        "unix_timestamp(date_trunc('day', ts)) AS day_s",
        "unix_timestamp(date_trunc('hour', ts)) AS hour_s",
        f"{hll_reg_sql(h)} AS reg",
        f"CAST({hll_rank_sql(h)} AS INT) AS rank",
    )
    hourly = keyed.groupBy("day_s", "hour_s", "reg").agg(F.max("rank").alias("m_rank"))
    daily_cascaded = hourly.groupBy("day_s", "reg").agg(F.max("m_rank").alias("m_rank"))
    daily_direct = keyed.groupBy("day_s", "reg").agg(F.max("rank").alias("m_rank"))

    est_c = hll_estimate(daily_cascaded, ["day_s"]).withColumnRenamed("est", "est_cascade")
    est_d = (
        hll_estimate(daily_direct, ["day_s"])
        .withColumnRenamed("est", "est_direct")
        .drop("present")
    )
    exact = events.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s")
    ).agg(F.countDistinct(key).alias("n_exact"))
    return (
        exact.join(est_d, "day_s")
        .join(est_c, "day_s")
        .select("day_s", "n_exact", "present", "est_direct", "est_cascade")
    )


def hdr_daily_quantiles(
    events: DataFrame, value: str = "value", pcts: tuple[int, ...] = (50, 95, 99)
) -> DataFrame:
    """Per-day quantile estimates from an HDR bucket-count sketch, cascaded
    hourly→daily by bucket-count SUM, alongside the direct daily sketch and
    the exact interpolated percentile for calibration. The target rank is
    the integer ceil(n·p/100) via (n·p+99) DIV 100 — no float rank, so the
    picked bucket is bit-identical across engines; the estimate is the
    bucket lower bound, guaranteeing q_est ≤ exact and exact < q_est·(1+1/16)
    + one value-grid step above v_int=31 (exact at or below).
    """
    v_int = f"CAST(floor({value} * {HDR_SCALE}) AS BIGINT)"
    keyed = events.where(F.col(value) > 0).selectExpr(
        "unix_timestamp(date_trunc('day', ts)) AS day_s",
        "unix_timestamp(date_trunc('hour', ts)) AS hour_s",
        f"CAST({hdr_index_sql(v_int)} AS BIGINT) AS idx",
    )
    hourly = keyed.groupBy("day_s", "hour_s", "idx").agg(F.count("*").alias("cnt"))
    daily_cascaded = hourly.groupBy("day_s", "idx").agg(F.sum("cnt").alias("cnt"))
    daily_direct = keyed.groupBy("day_s", "idx").agg(F.count("*").alias("cnt"))

    def pick(buckets: DataFrame, out_col: str) -> DataFrame:
        w = W.partitionBy("day_s").orderBy("idx")
        cum = buckets.select(
            "day_s",
            "idx",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(W.partitionBy("day_s")).alias("n_vals"),
        )
        c = cum.select(
            "day_s", "idx", "cum", "n_vals",
            F.explode(F.array(*[F.lit(x) for x in pcts])).alias("p_pct"),
        )
        hit = (
            c.where(F.col("cum") >= F.expr("(n_vals * p_pct + 99) DIV 100"))
            .groupBy("day_s", "p_pct", "n_vals")
            .agg(F.min("idx").alias("idx"))
        )
        # CAST-to-DOUBLE before dividing: a bare `/ 100.0` literal is
        # DECIMAL in Spark (memory-documented trap) and would emit Decimal
        # objects; the oracle's DuckDB `/ 100.0` is already float division
        # of the same integers, so the two stay bit-identical.
        q = f"round(CAST({hdr_lower_sql('idx')} AS DOUBLE) / {HDR_SCALE}, 4) + CAST(0.0 AS DOUBLE)"
        return hit.selectExpr("day_s", "p_pct", "n_vals", f"{q} AS {out_col}")

    casc = pick(daily_cascaded, "q_est")
    direct = pick(daily_direct, "q_est_direct").drop("n_vals")
    exact = events.where(F.col(value) > 0).groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s")
    ).agg(
        *[
            (F.round(F.expr(f"percentile({value}, {x / 100.0})"), 4) + F.lit(0.0)).alias(
                f"q{x}_exact"
            )
            for x in pcts
        ]
    )
    exact_long = exact.select(
        "day_s",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(x) for x in pcts]),
                F.array(*[F.col(f"q{x}_exact") for x in pcts]),
            )
        ).alias("p_pct", "q_exact"),
    )
    return (
        casc.join(direct, ["day_s", "p_pct"])
        .join(exact_long, ["day_s", "p_pct"])
        .select("day_s", "p_pct", "n_vals", "q_est", "q_est_direct", "q_exact")
    )


def hdr_index_py(v: int) -> int:
    """Pure-Python mirror of hdr_index_sql — the property-test oracle
    (tests/test_properties.py drives it to 2^52; tests/test_sketches.py
    pins the SQL fragment against it on random samples)."""
    if v < 32:
        return v
    b = v.bit_length()
    return 32 + (b - 6) * 16 + ((v >> (b - (HDR_SUB_BITS + 1))) & 15)


def hdr_lower_py(i: int) -> int:
    """Pure-Python mirror of hdr_lower_sql."""
    if i < 32:
        return i
    return (16 + (i - 32) % 16) << ((i - 32) // 16 + 1)


def hll_union(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union sketch across everything inside each group: the per-register
    MAX — the same associative merge the tier cascade uses, here collapsing
    a set dimension (e.g. source) instead of a time one. HLL register maxes
    are EXACTLY the sketch of the union of the underlying sets, so
    hll_estimate over the result estimates |A ∪ B ∪ …| with the same error
    envelope as a direct sketch of the union."""
    return registers.groupBy(*group_cols, "reg").agg(F.max("m_rank").alias("m_rank"))


def hll_overlap(
    registers: DataFrame,
    set_col: str,
    sets: tuple[str, str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pairwise overlap estimation by inclusion–exclusion over a register
    table carrying a two-valued ``set_col`` (e.g. two sources or two
    datasets): |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), clamped at 0 —
    the standard HLL audience-overlap / cross-dataset-contamination
    estimator. The two set ids are explicit (no discovery scan — the plan
    stays collect-free); rows under other ids are ignored. The error is
    the union of the three estimates' errors, so small intersections of
    large sets are noisy (inherent to inclusion–exclusion; declared, not
    hidden). Emits per group: est_a/est_b (in ``sets`` order), est_union,
    est_intersection."""
    g = list(group_cols or [])
    a, b = sets
    registers = registers.where(F.col(set_col).isin(a, b))
    per_set = hll_estimate(registers, g + [set_col]).drop("present")
    est_a = per_set.where(F.col(set_col) == a).drop(set_col).withColumnRenamed("est", "est_a")
    est_b = per_set.where(F.col(set_col) == b).drop(set_col).withColumnRenamed("est", "est_b")
    est_u = (
        hll_estimate(hll_union(registers, g), g)
        .drop("present")
        .withColumnRenamed("est", "est_union")
    )
    joined = (
        est_u.join(est_a, g) if g else est_u.crossJoin(est_a)
    )
    joined = joined.join(est_b, g) if g else joined.crossJoin(est_b)
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4), F.lit(0.0)
    )
    return joined.select(*g, "est_a", "est_b", "est_union", inter.alias("est_intersection"))


# ---------------------------------------------------------------------------
# Count-Min sketch: the third classic mergeable sketch (frequency/heavy-
# hitter estimation) next to HLL (distinct) and HDR (quantiles). Cormode &
# Muthukrishnan 2005, public semantics. d×w counter matrix; merge =
# elementwise SUM (associative → rides the tier cascade unchanged); point
# estimate = min over the d rows. Unlike Misra-Gries/SpaceSaving, CMS is
# ORDER-INDEPENDENT given its hash functions, so with the repo's md5→int
# hash lift the whole sketch — matrix, cascade, estimates — replays
# bit-for-bit in the DuckDB oracle.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 256


def cms_bucket_sql(h: str) -> str:
    """Bucket from a 40-bit integer hash expression (dialect-shared)."""
    return f"(({h}) & {CMS_W - 1})"


def _spark_hash40_salted(j: int, col: str) -> str:
    """Row-j hash: md5 of 'j:<key>' — d independent functions from one md5."""
    return (
        f"CAST(conv(substr(md5(concat('{j}:', CAST({col} AS STRING))), 1, 10), 16, 10) AS BIGINT)"
    )


def cms_bucket_py(j: int, key: int) -> int:
    """Pure-Python mirror of the row-j bucket (property-test oracle)."""
    import hashlib

    h = int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:10], 16)
    return h & (CMS_W - 1)


def cms_daily_estimates(
    events: DataFrame, key: str = "user_id", probe_mod: int = 59
) -> DataFrame:
    """Per-day CMS frequency estimates for a deterministic probe set,
    computed from BOTH the direct daily matrix and the hourly→daily
    SUM-cascaded one (equal by associativity; both emitted so the driver
    hash pins the cascade implementation). Probes = the distinct keys with
    key % probe_mod == 0; absent (day, j, bucket) cells count 0 (nothing
    hashed there), so est is the true min over all d rows. The CMS
    one-sided guarantee — est ≥ exact, always — is visible per row next to
    the exact count.

    Scale shape (r9 restructure): the RAW table is scanned ONCE, into a
    (day, hour, key)-keyed pre-aggregate — the md5 bucket functions depend
    only on the key, so hashing per DISTINCT (window, key) instead of per
    row is value-identical and shrinks the hash work by the key-repetition
    factor; every other input (daily per-key counts, probe set, day list,
    exact counts) derives from that aggregate instead of re-scanning raw.
    The matrix shuffles stay map-side-combinable; the cascade and the
    estimator touch only matrix rows (≤ days × d × w) and the tiny probe
    grid — at 10^12 rows the frequency answer costs d broadcast lookups
    per probe instead of a full groupBy over every key. The direct-vs-
    cascade self-check keeps two genuinely different aggregation
    topologies: single-level (daily per-key counts → matrix) vs two-level
    (hourly matrix → SUM-merged daily matrix).
    """
    legs = ", ".join(
        f"{j}, CAST({cms_bucket_sql(_spark_hash40_salted(j, 'k'))} AS INT)"
        for j in range(CMS_D)
    )
    base = events.selectExpr(
        "unix_timestamp(date_trunc('day', ts)) AS day_s",
        "unix_timestamp(date_trunc('hour', ts)) AS hour_s",
        f"CAST({key} AS BIGINT) AS k",
    )
    # one scan: per-(day, hour, key) counts (map-side combine); everything
    # below derives from this ~distinct-keys-sized frame, and the bucket
    # legs are stacked ONCE (a single codegen unit; both matrix legs and
    # the dhk exchange are shared subtrees AQE executes once)
    dhk = base.groupBy("day_s", "hour_s", "k").agg(F.count(F.lit(1)).alias("cnt"))

    # pin the stage that evaluates the d x md5 stack at the configured
    # width: the aggregate exchanges here carry only KBs, so AQE coalesces
    # their read side to one task and the hash work runs single-threaded
    # (same bytes-blind collapse as the grouped kernels — AQE cannot see
    # per-row expression CPU). The explicit post-aggregate repartition is
    # cheap (distinct-key-sized rows) and exempt from coalescing.
    # (keyed on (k, hour_s), NOT the aggregate's (day, hour, k): a
    # repartition on the same keys as the child's hash partitioning is
    # pruned as redundant and the pin silently vanishes — observed)
    n_part = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    stacked = dhk.repartition(n_part, "k", "hour_s").selectExpr(
        "day_s", "hour_s", "cnt", f"stack({CMS_D}, {legs}) AS (j, bucket)"
    )
    hourly = stacked.groupBy("day_s", "hour_s", "j", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    daily_cascade = hourly.groupBy("day_s", "j", "bucket").agg(F.sum("cnt").alias("cnt"))
    # the DIRECT leg aggregates the same stacked rows in ONE level (day, j,
    # bucket) — bucketing commutes with summing over hours, so this equals
    # the old build-from-daily-counts matrix value-for-value while keeping
    # a genuinely different topology from the hourly→SUM cascade leg
    daily_direct = stacked.groupBy("day_s", "j", "bucket").agg(F.sum("cnt").alias("cnt"))

    # probes / day list / exact counts branch straight off dhk (no extra
    # aggregation level on the critical path); exact filters to probe keys
    # BEFORE aggregating — value-identical for the joined keys
    probes = dhk.select("k").where(F.col("k") % probe_mod == 0).distinct()
    probe_legs = ", ".join(
        f"{j}, CAST({cms_bucket_sql(_spark_hash40_salted(j, 'k'))} AS INT)"
        for j in range(CMS_D)
    )
    probe_buckets = probes.selectExpr("k", f"stack({CMS_D}, {probe_legs}) AS (j, bucket)")
    days = dhk.select("day_s").distinct()
    grid = days.crossJoin(F.broadcast(probe_buckets))

    def estimate(matrix: DataFrame, out: str) -> DataFrame:
        cell = grid.join(F.broadcast(matrix), ["day_s", "j", "bucket"], "left").select(
            "day_s", "k", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
        return cell.groupBy("day_s", "k").agg(F.min("cnt").cast("long").alias(out))

    exact = (
        days.crossJoin(F.broadcast(probes))
        .join(
            dhk.where(F.col("k") % probe_mod == 0)
            .groupBy("day_s", "k")
            .agg(F.sum("cnt").alias("n")),
            ["day_s", "k"],
            "left",
        )
        .select("day_s", "k", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_exact"))
    )
    return (
        exact.join(estimate(daily_direct, "est_direct"), ["day_s", "k"])
        .join(estimate(daily_cascade, "est_cascade"), ["day_s", "k"])
        .select("day_s", "k", "n_exact", "est_direct", "est_cascade")
    )
