"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE COMPACT JSON
line as the LAST line of stdout:
{"metric": ..., "value": N, "unit": "sec", "queries": {flagship walls},
 "calib_pre": ops/s, "calib_post": ops/s, "sf": ...}

The full 60+-entry per-query seconds map goes to BENCH_QUERIES.json next to
this file — round-5 lesson: the driver's fixed-size stdout tail clipped the
headline line mid-token once the map grew past it (BENCH_r05.json
`parsed: null`), so the stdout line carries only scalars + the two flagship
walls and stays a few hundred bytes.

Noise adjudication (round-5 lesson #2): this shared box's co-tenant load has
inflated whole suites by 1.76x median. Each run now brackets itself with a
single-thread host-speed probe (same burn as scripts/scaling.py — quiet box
reads 500-800 ops/s, documented collapses 0.3-28), waits up to
$SPARK_GRAFT_PROBE_MAX_WAIT_S (default 600s) for the probe to clear
$SPARK_GRAFT_PROBE_MIN (default 400 ops/s) before timing, and reports
calib_pre/calib_post in the headline line so a noisy run is self-documenting.

The headline metric is the flagship tokens pipeline's rolled-up points/sec
across all retention tiers (BASELINE.json:metric); per-query seconds cover
the operator families. Run scripts/scaling.py for the N-vs-4N evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PROBE_MIN = float(os.environ.get("SPARK_GRAFT_PROBE_MIN", "400"))
PROBE_MAX_WAIT_S = int(os.environ.get("SPARK_GRAFT_PROBE_MAX_WAIT_S", "600"))
QUERIES_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json")

# single-thread host-speed burn, identical to scripts/scaling.py's CALIBRATE:
# co-tenant interference shows up as a LOWER ops/s number
_PROBE_SRC = r"""
import json, time
import numpy as np
rng = np.random.default_rng(0)
A = rng.random((384, 384)); B = rng.random((384, 384))
x = rng.random(1 << 16)
t0 = time.time(); n = 0
while time.time() - t0 < 1.0:
    (A @ B); np.fft.rfft(x); n += 1
print(json.dumps({"ops_s": round(n / (time.time() - t0), 1)}))
"""


def host_probe(best_of: int = 1, gap_s: float = 0.0) -> float:
    """Best-of-N single-thread probe: transient churn (e.g. the Spark JVM's
    own shutdown cleanup right after spark.stop()) reads as a one-probe
    collapse; the max over a few spaced probes reflects the steady box."""
    # scrub the BLAS thread pins session.get_spark writes into our own env
    # (inherited by children): a post-session probe would otherwise run
    # single-threaded BLAS and read ~6x lower than the pre-session probe
    # and scripts/scaling.py's documented 548-824 ops/s quiet range
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS")
    }
    vals = []
    for i in range(best_of):
        if i and gap_s:
            time.sleep(gap_s)
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], capture_output=True, text=True, env=env
        )
        try:
            vals.append(json.loads(out.stdout.strip().splitlines()[-1])["ops_s"])
        except Exception:
            vals.append(float("nan"))
    return max(vals)
TOKENS_ROWS = int(os.environ.get("SPARK_GRAFT_TOKENS_ROWS", "2000000"))
# flagship fixture shape: rolled-up points = sources x horizon grid cells,
# so the headline pps needs a wide horizon, not just more rows (100k rows /
# 7 days saturated at 164k points — overhead-dominated)
HORIZON_DAYS = int(os.environ.get("SPARK_GRAFT_HORIZON_DAYS", "56"))
N_SOURCES = int(os.environ.get("SPARK_GRAFT_SOURCES", "64"))
# best-of-N for the headline: identical flagship runs measured 177k-288k pps
# on this shared box (co-tenant noise) — same protocol as scripts/scaling.py
FLAGSHIP_REPEATS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPEATS", "2"))

BENCH_QUERIES = [
    "rollup_1m",
    "rollup_1h_cascade",
    "gapfill_zero_1m",
    "gapfill_ffill_1m",
    "lag_diff",
    "running_sum",
    "sliding_avg",
    "trend_slope",
    "topk_per_group",
    "sessionize",
    "q1_pricing",
    "region_revenue",
    "asof_join",
    "session_attribution",
    "epoch_pairs",
    "triplets_consecutive",
    "closure_regression",
    "triplets_full",
    "closure_invert",
    "closure_pair_correction",
    "corrected_drift",
    "running_product",
    "phase_cumprod",
    "phase_unwrap",
    "interferogram",
    "mean_lag_coherence",
    "kappa_grid",
    "bootstrap_pvalue",
    "dedup_exact",
    "jaccard_pairs",
    "jaccard_verified",
    "minhash_signatures",
    "lsh_candidates",
    "near_dup_lsh",
    "simhash",
    "word_stats",
    "quality_score",
    "fingerprint",
    "vocab_topk",
    "unigram_logprob",
    "token_packing",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "near_dup_cosine",
    "high_pass_ratio",
    "gapfill_linear_1m",
    "gapfill_cross_1m",
    "lc_window_stats",
    "repetition_stats",
    "tfidf_topterms",
    "boilerplate_ngrams",
    "eigen_mle_1m",
    "eigen_complex_1m",
    "eigen_1m",
    "nl_phase_fit_1m",
    "nearest_point",
    "ann_lsh_topk",
    "ann_lsh_q100",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_resize",
    "multimodal_audio_stats",
    "compress_chunks",
    "codec_roundtrip",
]


def tokens_table(spark, n_rows: int):
    """Deterministic synthetic tokens table (FIXTURES.md F1), generated once
    to a local parquet cache so every bench run scans the same files.
    payload_tokens=False at bench scale: the tier pipeline provably never
    scans the tokens column (column pruning, tests/test_plans.py) — byte-
    exact payload pass-through is pinned separately at fixture scale."""
    from covsar_spark.datagen import write_tokens

    cache = f"/tmp/covsar_bench_tokens_{n_rows}_{N_SOURCES}"
    if not os.path.exists(os.path.join(cache, "_DONE")):
        write_tokens(cache, n_rows, n_sources=N_SOURCES, payload_tokens=False)
        open(os.path.join(cache, "_DONE"), "w").close()
    return spark.read.parquet(cache).select("doc_id", "n_tok", "source")


def run_flagship(spark, n_rows: int, with_closure: bool = False) -> tuple[float, int]:
    """Full tier pipeline; returns (seconds, rolled-up points across tiers).

    ``with_closure`` adds the defining CovSAR stage — per-span closure
    evaluation + fit + least-norm correction + drift/chi2 stats — off the
    same persisted rollups, and materializes its output in the timed region
    (reported as the second headline number)."""
    from covsar_spark.plans.pipeline import run_tiers

    from functools import reduce

    tokens = tokens_table(spark, n_rows)
    tokens.count()  # warm the scan; the timed region measures the pipeline
    t0 = time.time()
    tiers = run_tiers(
        tokens, with_eigen=True, with_chunks=True, persist=True,
        with_closure=with_closure,
        horizon_s=HORIZON_DAYS * 86400,
    )
    # single action per output family: tiers materialize concurrently; noop
    # sink forces every output column (count() would prune)
    filled_all = reduce(lambda a, b: a.unionByName(b), [d["filled"] for d in tiers.values()])
    fused_all = reduce(lambda a, b: a.unionByName(b), [d["fused"] for d in tiers.values()])
    filled_all.write.format("noop").mode("overwrite").save()
    fused_all.write.format("noop").mode("overwrite").save()
    if with_closure:
        closure_all = reduce(
            lambda a, b: a.unionByName(b), [d["closure"] for d in tiers.values()]
        )
        closure_all.write.format("noop").mode("overwrite").save()
    # point count from the persisted kernel rows (one tiny agg) — a count()
    # over the exploded dense table would re-pay the explode
    total_points = int(
        fused_all.select(F.sum("n_points").alias("p")).collect()[0]["p"]
    )
    wall = time.time() - t0
    for d in tiers.values():
        for key in ("rollup", "filled", "fused"):
            if key in d:
                d[key].unpersist()
    return wall, total_points


def main():
    from covsar_spark.contract import QUERIES
    from covsar_spark.session import get_spark

    # probe-gate BEFORE paying JVM startup: wait (bounded) for a quiet box
    # so the timed suite measures the engine, not the co-tenants
    waited_s = 0
    calib_pre = host_probe()
    while calib_pre < PROBE_MIN and waited_s < PROBE_MAX_WAIT_S:
        time.sleep(30)
        waited_s += 30
        calib_pre = host_probe()

    spark = get_spark("covsar_bench", cores=CPUS, shuffle_partitions=CPUS)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # path merely contains 'sf' without a trailing number

    # warm the JVM/Arrow paths once so per-query numbers measure the plan
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        # noop sink: materializes EVERY output column — a bare count() lets
        # Catalyst prune the projections being measured
        df.write.format("noop").mode("overwrite").save()
        q_times[name] = round(time.time() - t0, 3)

    wall, points = min(
        (run_flagship(spark, TOKENS_ROWS) for _ in range(FLAGSHIP_REPEATS)),
        key=lambda r: r[0],
    )
    pps = points / wall if wall > 0 else 0.0
    q_times["flagship_pipeline"] = round(wall, 3)

    # second headline: the same pipeline WITH the closure-correction stage
    # (the defining CovSAR step) materialized in the timed region
    wall_c, points_c = min(
        (run_flagship(spark, TOKENS_ROWS, with_closure=True) for _ in range(FLAGSHIP_REPEATS)),
        key=lambda r: r[0],
    )
    pps_c = points_c / wall_c if wall_c > 0 else 0.0
    q_times["flagship_pipeline_closure"] = round(wall_c, 3)

    # stop the session BEFORE the post-probe: an idle local[N] JVM still
    # competes with the single-thread burn (measured 701 -> 115 ops/s with
    # the session alive), which would make every post-probe read "noisy"
    spark.stop()
    calib_post = host_probe(best_of=3, gap_s=3.0)
    total = round(sum(q_times.values()), 3)

    # full per-query map -> file artifact (the driver records the repo, so
    # BENCH_QUERIES.json travels with the round); stdout stays compact
    with open(QUERIES_OUT, "w") as f:
        json.dump(
            {
                "total_sec": total,
                "n_queries": len(q_times),
                "sf": sf,
                "cpus": CPUS,
                "tokens_rows": TOKENS_ROWS,
                "calib_pre_ops_s": calib_pre,
                "calib_post_ops_s": calib_post,
                "probe_waited_s": waited_s,
                "queries": q_times,
            },
            f,
            indent=1,
        )

    # the COMPACT headline line — LAST line of stdout, scalars only plus the
    # two flagship walls (keeps the driver's tail capture whole)
    print(
        json.dumps(
            {
                "metric": "total bench seconds (headline queries + flagship tiers pipeline)",
                "value": total,
                "unit": "sec",
                "rolled_up_points_per_sec": round(pps, 1),
                "flagship_wall_sec": round(wall, 3),
                "flagship_points": points,
                "rolled_up_points_per_sec_with_closure": round(pps_c, 1),
                "flagship_closure_wall_sec": round(wall_c, 3),
                "tokens_rows": TOKENS_ROWS,
                "queries": {
                    "flagship_pipeline": q_times["flagship_pipeline"],
                    "flagship_pipeline_closure": q_times["flagship_pipeline_closure"],
                },
                "n_queries": len(q_times),
                "queries_file": "BENCH_QUERIES.json",
                "calib_pre": calib_pre,
                "calib_post": calib_post,
                "probe_waited_s": waited_s,
                "sf": sf,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
