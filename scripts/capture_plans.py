"""Capture .explain("formatted") for every bench query into plans/r09/.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

Plan-only (no execution): builds each DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.1) and writes plans/r09/<name>_<tag>.txt. With no names,
captures the full bench list plus the flagship tier pipelines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def flagship_df(spark, with_closure: bool):
    from functools import reduce

    from covsar_spark.plans.pipeline import run_tiers

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    tokens = bench.tokens_table(spark, bench.TOKENS_ROWS)
    tiers = run_tiers(
        tokens, with_eigen=True, with_chunks=True, persist=False,
        with_closure=with_closure, horizon_s=bench.HORIZON_DAYS * 86400,
    )
    fused_all = reduce(lambda a, b: a.unionByName(b), [d["fused"] for d in tiers.values()])
    if with_closure:
        return reduce(lambda a, b: a.unionByName(b), [d["closure"] for d in tiers.values()])
    return fused_all


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from covsar_spark.contract import QUERIES
    from covsar_spark.session import get_spark

    import bench

    spark = get_spark("covsar_plans", shuffle_partitions=None)
    todo = names or (bench.BENCH_QUERIES + ["flagship_pipeline", "flagship_pipeline_closure"])
    for name in todo:
        try:
            if name == "flagship_pipeline":
                df = flagship_df(spark, with_closure=False)
            elif name == "flagship_pipeline_closure":
                df = flagship_df(spark, with_closure=True)
            else:
                df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure, keep going
            plan = f"ERROR building plan: {e!r}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
