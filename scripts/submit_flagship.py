"""spark-submit entry point for the flagship tier pipeline (the north-rule
launch path):

    python scripts/make_pyfiles.py
    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/covsar_spark.zip \
        scripts/submit_flagship.py --tokens <parquet dir> --out <dir> \
        [--horizon-days 7] [--tiers 1m,1h,1d] [--with-closure]

The script takes its SparkSession from spark-submit's conf (master, executor
counts, memory all come from the launcher — at N vs 4N executors only the
submit flags change), reads the tokens table, runs the tier pipeline
(rollup cascade -> gap-fill/eigen/codec tier kernel [-> closure stats]),
writes each tier day-partitioned plus the S9 timeseries sink, and prints one
JSON summary line. Exercised end-to-end from a clean cwd (package available
ONLY through --py-files) by tests/test_submit.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--horizon-days", type=int, default=7)
    p.add_argument("--tiers", default="1m,1h,1d")
    p.add_argument("--with-closure", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from covsar_spark.plans.pipeline import run_tiers
    from covsar_spark.sources.sinks import write_timeseries
    from covsar_spark.sources.tables import write_tier

    spark = SparkSession.builder.appName("covsar_flagship").getOrCreate()
    tokens = spark.read.parquet(args.tokens).select("doc_id", "n_tok", "source")

    t0 = time.time()
    tiers = run_tiers(
        tokens,
        with_eigen=True,
        with_chunks=True,
        with_closure=args.with_closure,
        persist=True,
        horizon_s=args.horizon_days * 86400,
    )
    wanted = [t.strip() for t in args.tiers.split(",") if t.strip()]
    unknown = [t for t in wanted if t not in tiers]
    if unknown:
        raise SystemExit(
            f"unknown tier(s) {unknown}; valid: {sorted(tiers)} "
            "(validated BEFORE any output is written)"
        )
    points = 0
    for tier, d in tiers.items():
        if tier not in wanted:
            continue
        write_tier(d["filled"], f"{args.out}/tier_{tier}", tier)
        d["chunks"].write.mode("overwrite").parquet(f"{args.out}/chunks_{tier}")
        points += d["filled"].count()
        if args.with_closure:
            d["closure"].write.mode("overwrite").parquet(f"{args.out}/closure_{tier}")
    from covsar_spark.schemas import EIGEN_SPAN

    first = wanted[0]
    write_timeseries(
        tiers[first]["rollup"], tiers[first]["eigen"], f"{args.out}/timeseries_{first}",
        span=EIGEN_SPAN[first],
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "points": points,
                "wall_s": round(wall, 3),
                "pps": round(points / wall, 1) if wall > 0 else 0.0,
                "tiers": wanted,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
