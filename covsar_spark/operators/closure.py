"""Triplet/closure operators — the CovSAR specialty, re-expressed relationally.

Reference semantics:
- pairwise interferogram formation = self-join of the epoch axis with itself,
  upper triangle j > i (covsar/covariance.py:27-43) ........... `epoch_pairs`
- triplet enumeration (i,j,k) + per-triplet closure and intensity-triplet
  stacks (covsar/closures.py:48-71, covsar/closure_inten.py:205-218;
  intensity triplet = nested difference, covsar/library.py:239-272)
  ............................................... `consecutive_triplets`
- the consecutive-chain mask (covsar/closures.py:303-310) is the W6 filter
  j = i+1, k = j+1 — it bounds the relational size to O(epochs), which is
  what makes the 3-way self-join scale (full C(N,3) enumeration stays
  group-local inside kernels, never relational).
- closure-vs-intensity regression per pixel (covsar/closure_inten.py:250-256)
  = grouped corr + regr_slope .......................... `closure_regression`
- least-norm inversion of fitted closures back to per-pair errors via the
  triplets->pairs design matrix pseudo-inverse (covsar/closures.py:271-292,
  design matrix construction covsar/closures.py:74-115)
  .................................... `design_matrix` / `invert_closures`
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TIERS


def lag_pairs(roll: DataFrame, tier_s: int, max_lag: int = 3) -> DataFrame:
    """Bounded-lag pair set (source, e_i, e_j, lag, v_i, v_j): explode the
    lag list and equi-join on the COMPUTED epoch. This is the ONE definition
    of the anti-degradation join shape — a raw theta join
    (e_j > e_i AND e_j <= e_i + k) silently becomes a nested-loop join
    (O(n^2) per source; measured 46s vs <1s at sf0.1). Shared by
    epoch_pairs and mean_lag_coherence (round-4 review: the construction
    was duplicated)."""
    a = roll.select(
        "source",
        F.col("epoch_s").alias("e_i"),
        F.col("token_count").alias("v_i"),
        F.explode(F.array(*[F.lit(k) for k in range(1, max_lag + 1)])).alias("lag"),
    ).withColumn("e_j", F.col("e_i") + F.col("lag") * tier_s)
    b = roll.select("source", F.col("epoch_s").alias("e_j"), F.col("token_count").alias("v_j"))
    return a.join(b, ["source", "e_j"])


def epoch_pairs(roll: DataFrame, tier: str, max_lag: int = 3) -> DataFrame:
    """Bounded-lag pairs (i, j), 1 <= j-i <= max_lag epochs, projecting the
    product and log-ratio of window rates — the relational form of
    interferogram formation x_i * conj(x_j)."""
    tier_s = TIERS[tier]
    return lag_pairs(roll, tier_s, max_lag).select(
        "source",
        "e_i",
        "e_j",
        F.col("lag").cast("long").alias("lag"),
        # DOUBLE product, not int64: the interferogram analogue x_i * x_j
        # is float in the reference, and two hot 1d-tier windows beyond ~3e9
        # tokens would overflow int64 (ANSI mode -> job abort; round-4
        # review). Exact below 2^53; identical IEEE multiply in both engines.
        (F.col("v_i").cast("double") * F.col("v_j").cast("double")).alias("pair_prod"),
        F.round(
            F.log((F.col("v_i") + F.lit(1.0)) / (F.col("v_j") + F.lit(1.0))), 6
        ).alias("log_ratio"),
    )


def consecutive_triplets(roll: DataFrame, tier: str) -> DataFrame:
    """Chain triplets (i, i+1, i+2): 3-way equi-join on computed epoch keys.

    closure   = v_i - 2*v_j + v_k  (nested difference — the real-valued
                intensity-triplet analogue, covsar/library.py:239-272)
    level     = (v_i + v_j + v_k) / 3
    """
    tier_s = TIERS[tier]
    a = roll.select("source", F.col("epoch_s").alias("e_i"), F.col("token_count").alias("v_i"))
    b = roll.select("source", (F.col("epoch_s") - tier_s).alias("e_i"), F.col("token_count").alias("v_j"))
    c = roll.select("source", (F.col("epoch_s") - 2 * tier_s).alias("e_i"), F.col("token_count").alias("v_k"))
    return (
        a.join(b, ["source", "e_i"])
        .join(c, ["source", "e_i"])
        .select(
            "source",
            "e_i",
            (F.col("v_i") - 2 * F.col("v_j") + F.col("v_k")).alias("closure"),
            F.round((F.col("v_i") + F.col("v_j") + F.col("v_k")) / 3.0, 6).alias("level"),
        )
    )


def closure_regression(triplets: DataFrame) -> DataFrame:
    """Per-source Pearson r + OLS slope of closure on level
    (covsar/closure_inten.py:250-256 regression, as grouped aggregates)."""
    # explicit covar/stddev formula with nullif guards: identical on both
    # engines and NULL (not an ANSI error) for degenerate zero-variance groups
    return triplets.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_triplets"),
        F.round(
            F.expr(
                "covar_samp(closure, level) / nullif(stddev_samp(closure) * stddev_samp(level), 0.0)"
            ),
            6,
        ).alias("pearson_r"),
        F.round(
            F.expr("covar_samp(closure, level) / nullif(var_samp(level), 0.0)"), 6
        ).alias("slope"),
        F.round(F.sqrt(F.avg(F.col("closure") * F.col("closure"))), 6).alias("rmse"),
    )


def mean_lag_coherence(roll: DataFrame, tier: str, max_lag: int = 3) -> DataFrame:
    """A5 `mean_coh` (covsar/library.py:57-65): per (source, lag) mean of the
    normalized pair statistic over the lag-k pair set — the graft's
    lag-coherence is the cross-correlation of the series with its k-lag
    shift, plus the mean |log-ratio| magnitude of the pairs."""
    tier_s = TIERS[tier]
    pairs = lag_pairs(roll, tier_s, max_lag)
    return pairs.groupBy("source", F.col("lag").cast("long").alias("lag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.avg(F.abs(F.log((F.col("v_i") + 1.0) / (F.col("v_j") + 1.0)))), 6
        ).alias("mean_abs_logratio"),
        F.round(
            F.expr(
                "covar_samp(v_i, v_j) / nullif(stddev_samp(v_i) * stddev_samp(v_j), 0.0)"
            ),
            6,
        ).alias("lag_corr"),
    )


def kappa_grid_search(
    triplets: DataFrame, kappas: tuple[float, ...] = (0.25, 0.5, 1.0, 2.0, 4.0)
) -> DataFrame:
    """Kappa grid optimization (covsar/optimize_kappa.py:44-57): score each
    kappa's logistic transform of the triplet level against the closures
    (R^2 of the linear fit) per source, keep the argmax
    (np.argmax(R2s) -> row_number = 1). Scores are rounded BEFORE ranking so
    the argmax is engine-deterministic; ties break toward smaller kappa."""
    from pyspark.sql import Window as W

    from ..functions.complexmath import logistic

    g = triplets.withColumn(
        "kappa", F.explode(F.array(*[F.lit(k) for k in kappas]))
    ).withColumn("x", logistic(F.col("level") - 1.0, F.col("kappa")))
    scored = g.groupBy("source", "kappa").agg(
        F.count(F.lit(1)).alias("n_triplets"),
        F.round(
            F.expr(
                "pow(covar_samp(x, closure), 2)"
                " / nullif(var_samp(x) * var_samp(closure), 0.0)"
            ),
            6,
        ).alias("r2"),
    )
    w = W.partitionBy("source").orderBy(F.col("r2").desc(), F.col("kappa").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("source", F.col("kappa").alias("best_kappa"), F.col("r2").alias("best_r2"), "n_triplets")
    )


def ranked_span_epochs(
    roll: DataFrame, span_s: int = 600, max_epochs: int = 10
) -> DataFrame:
    """Index each (source, span)'s epochs 0..N-1 (glob-sort + files[:N] limit
    analogue, covsar/closure_inten.py:70-73). Returns (source, span_s, n, idx,
    v) where n = epochs kept in the span."""
    from pyspark.sql import Window as W

    w = W.partitionBy("source", "span_s").orderBy("epoch_s")
    d = (
        roll.withColumn("span_s", (F.floor(F.col("epoch_s") / span_s) * span_s).cast("long"))
        .withColumn("idx", F.row_number().over(w) - 1)
        .filter(F.col("idx") < max_epochs)
        .select("source", "span_s", "idx", F.col("token_count").alias("v"))
    )
    # kept-epochs count as a second window over the SAME partitioning, not a
    # groupBy + self-join: the count reuses the row_number exchange (one
    # unsorted whole-partition frame, no extra sort) where the join form
    # re-executed the whole upstream rollup subtree a second time (r9;
    # guide §2.4 — closure_invert's plan re-scanned the source 40x through
    # this helper). Values identical: count over the filtered partition ==
    # the joined per-(source, span) count, and consumers that ignore `n`
    # (full_triplets) get it pruned by Catalyst.
    wn = W.partitionBy("source", "span_s")
    return d.withColumn("n", F.count(F.lit(1)).over(wn)).select(
        "source", "span_s", "idx", "v", "n"
    )


def span_pairs(roll: DataFrame, span_s: int = 600, max_epochs: int = 10) -> DataFrame:
    """ALL C(N,2) pair values per (source, span): phi_ij = cbrt(v_i - v_j)
    (signed-root pair statistic, covsar/closures.py:27-32) — the relational
    upper-triangle self-join (covsar/covariance.py:27-43)."""
    from ..functions.complexmath import signed_root

    r = ranked_span_epochs(roll, span_s, max_epochs)
    a = r.select("source", "span_s", "n", F.col("idx").alias("i"), F.col("v").alias("v_i"))
    b = r.select("source", "span_s", F.col("idx").alias("j"), F.col("v").alias("v_j"))
    return (
        a.join(b, ["source", "span_s"])
        .filter(F.col("j") > F.col("i"))
        .select(
            "source", "span_s", "n", "i", "j",
            signed_root(F.col("v_i") - F.col("v_j"), 3).alias("phi"),
        )
    )


def full_triplets(roll: DataFrame, span_s: int = 600, max_epochs: int = 10) -> DataFrame:
    """ALL C(N,3) triplet closures + intensity-triplet regressors per
    (source, span) — the reference's full enumeration evaluated distributed
    (covsar/closure_inten.py:205-218; regressor covsar/library.py:239-272):
    closure = phi_ij + phi_jk - phi_ik, amp = (I_i - I_j) - (I_j - I_k),
    I = 10*log10(v + 1)."""
    r = ranked_span_epochs(roll, span_s, max_epochs)
    a = r.select("source", "span_s", F.col("idx").alias("i"), F.col("v").alias("v_i"))
    b = r.select("source", "span_s", F.col("idx").alias("j"), F.col("v").alias("v_j"))
    c = r.select("source", "span_s", F.col("idx").alias("k"), F.col("v").alias("v_k"))
    ivals = lambda v: 10.0 * F.log10(v + 1.0)  # noqa: E731
    return (
        a.join(b, ["source", "span_s"])
        .filter(F.col("j") > F.col("i"))
        .join(c, ["source", "span_s"])
        .filter(F.col("k") > F.col("j"))
        .select(
            "source", "span_s", "i", "j", "k",
            F.round(
                F.cbrt(F.col("v_i") - F.col("v_j"))
                + F.cbrt(F.col("v_j") - F.col("v_k"))
                - F.cbrt(F.col("v_i") - F.col("v_k")),
                6,
            ).alias("closure"),
            F.round(
                (ivals(F.col("v_i")) - ivals(F.col("v_j")))
                - (ivals(F.col("v_j")) - ivals(F.col("v_k"))),
                6,
            ).alias("amp_triplet"),
        )
    )


def closure_invert_relational(
    roll: DataFrame, span_s: int = 600, max_epochs: int = 10
) -> DataFrame:
    """Least-norm inversion of each span's OWN closures back to per-pair
    errors, fully relational: e = A_dagger (A phi) is exactly the projection
    of phi off the consistent subspace {phi_ij = theta_i - theta_j}
    (null space of A), so e_ij = phi_ij - (theta_i - theta_j) with
    theta_i = (1/N) sum_j phitilde_ij over the antisymmetric extension —
    closed form of covsar/closures.py:271-292 for c in range(A), validated
    bit-wise against pinv(A) in tests/test_closure_correct.py."""
    p = span_pairs(roll, span_s, max_epochs)
    edges = p.select(
        "source", "span_s", "n", F.col("i").alias("node"), F.col("phi").alias("contrib")
    ).unionByName(
        p.select("source", "span_s", "n", F.col("j").alias("node"), (-F.col("phi")).alias("contrib"))
    )
    theta = edges.groupBy("source", "span_s", "node").agg(
        (F.sum("contrib") / F.first("n")).alias("theta")
    )
    ti = theta.select("source", "span_s", F.col("node").alias("i"), F.col("theta").alias("th_i"))
    tj = theta.select("source", "span_s", F.col("node").alias("j"), F.col("theta").alias("th_j"))
    return (
        p.join(ti, ["source", "span_s", "i"])
        .join(tj, ["source", "span_s", "j"])
        .select(
            "source", "span_s", "i", "j",
            F.round("phi", 6).alias("phi"),
            F.round(F.col("phi") - (F.col("th_i") - F.col("th_j")), 6).alias("err"),
            F.round(F.col("th_i") - F.col("th_j"), 6).alias("consistent"),
        )
    )


# ---------------------------------------------------------------------------
# Least-norm closure inversion (numpy kernel; covsar/closures.py:271-292)
# ---------------------------------------------------------------------------


def design_matrix(n: int) -> tuple[np.ndarray, list[tuple[int, int]], list[tuple[int, int, int]]]:
    """Triplets -> pairs incidence A (T x P): closure_t = e_ij + e_jk - e_ik.

    Proper integer indexing instead of the reference's stringified f'{i}{j}'
    keys (buggy for N > 10, covsar/closures.py:88-94)."""
    pairs = list(combinations(range(n), 2))
    pidx = {p: c for c, p in enumerate(pairs)}
    trips = list(combinations(range(n), 3))
    A = np.zeros((len(trips), len(pairs)))
    for t, (i, j, k) in enumerate(trips):
        A[t, pidx[(i, j)]] = 1.0
        A[t, pidx[(j, k)]] = 1.0
        A[t, pidx[(i, k)]] = -1.0
    return A, pairs, trips


def invert_closures(closures: np.ndarray, n: int) -> np.ndarray:
    """Least-norm per-pair errors from per-triplet closures: e = A^+ c
    (pseudo-inverse solve, covsar/closures.py:284-292). Exactly consistent:
    A @ e reproduces any closure vector in range(A)."""
    A, _, _ = design_matrix(n)
    return np.linalg.pinv(A) @ np.asarray(closures, dtype=np.float64)
