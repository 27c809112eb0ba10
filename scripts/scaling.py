"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
flagship tiers pipeline on the SAME input at two parallelism levels
(local[8] = N, local[32] = 4N — the sandbox proxy for N vs 4N executors),
report throughput at both + efficiency = (pps_32 / pps_8) / 4.

Each level runs in its own subprocess (a JVM can't change master); results
land on stdout as JSON and should be recorded in BENCH.md / BASELINE.md.

Usage: python scripts/scaling.py [n_rows] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cores = int(sys.argv[1]); n_rows = int(sys.argv[2])
from covsar_spark.session import get_spark
from covsar_spark.plans.pipeline import run_tiers

spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
tokens = spark.read.parquet(sys.argv[3])
tokens.count()  # warm scan outside the timed region

t0 = time.time()
tiers = run_tiers(tokens, with_eigen=True, with_chunks=True, persist=True)
points = 0
for d in tiers.values():
    points += d["filled"].count()
    d["eigen"].count()
    d["chunks"].count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "wall_s": round(wall, 3), "points": points,
                  "pps": round(points / wall, 1)}))
"""


def run_level(cores: int, n_rows: int, data: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_rows), data],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"child (cores={cores}) produced no result")
    return json.loads(lines[-1])


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from covsar_spark.datagen import write_tokens

    data = f"/tmp/covsar_scaling_tokens_{n_rows}"
    if not os.path.exists(os.path.join(data, "_DONE")):
        write_tokens(data, n_rows)
        open(os.path.join(data, "_DONE"), "w").close()

    results = {8: [], 32: []}
    for _ in range(repeats):
        for cores in (8, 32):
            r = run_level(cores, n_rows, data)
            results[cores].append(r)
            print(json.dumps(r))
    best8 = max(r["pps"] for r in results[8])
    best32 = max(r["pps"] for r in results[32])
    eff = (best32 / best8) / 4.0
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "pps_local8": best8,
                "pps_local32": best32,
                "speedup_8_to_32": round(best32 / best8, 3),
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
