"""100x dedup-chain scale point (r7 verdict #8): the 1x/10x/30x series is
strong; one 100x reading on the three cheapest dedup queries closes the
extrapolation argument for the 100 TB dedup claim.

Amplifies ONLY the documents table (the dedup chain reads nothing else) with
the same structure-preserving transform as scripts/scale_study.py — doc_id
shifted per copy, every word per-copy suffixed so cross-copy near-duplicates
cannot form and within-copy dedup structure is exact. Times dedup_exact,
simhash, minhash_signatures best-of-1 (verdict-specified: the in-run
/proc/stat co-tenant sampler carries the noise evidence instead of repeats)
and merges a `dedup_chain_100x` key into BENCH_SCALE_STUDY.json with
slope_vs_linear = (sec_100x / sec_1x) / 100.

Usage: python scripts/dedup_100x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 100
SRC = "/root/testdata/sf0.1"
NAMES = ["dedup_exact", "simhash", "minhash_signatures"]


def main() -> None:
    from bench import NoiseSampler
    from covsar_spark.contract import QUERIES
    from covsar_spark.session import get_spark
    from scripts.scale_study import _amplify_table

    spark = get_spark("covsar_dedup_100x", cores=32, shuffle_partitions=32)
    amp_dir = f"/tmp/covsar_docs_amp_{K}x"
    done = os.path.join(amp_dir, "_DONE")
    if not os.path.exists(done):
        _amplify_table(spark, "documents", K, amp_dir)
        open(done, "w").close()

    # warm both scan paths so the timed walls compare plans, not page cache
    spark.read.parquet(f"{SRC}/documents.parquet").count()
    n_amp = spark.read.parquet(f"{amp_dir}/documents.parquet").count()

    sampler = NoiseSampler()
    sampler.start()
    rows = []
    for name in NAMES:
        walls = {}
        noise = {}
        for label, sf_dir in (("sec_1x", SRC), (f"sec_{K}x", amp_dir)):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[label] = round(time.time() - t0, 3)
            noise[label] = sampler.window_max(t0, time.time())
        rows.append({
            "query": name,
            **walls,
            "slope_vs_linear": round(walls[f"sec_{K}x"] / walls["sec_1x"] / K, 3),
            "noise_cores_max": noise,
            "expect": "linear",
        })
        print(json.dumps(rows[-1]), flush=True)

    flagged = [r["query"] for r in rows if r["slope_vs_linear"] > 1.3]
    out_path = os.path.join(REPO, "BENCH_SCALE_STUDY.json")
    study = json.load(open(out_path))
    study["dedup_chain_100x"] = {
        "k_copies": K,
        "amplified_docs_rows": n_amp,
        "repeats_best_of": 1,
        "note": (
            "r7 verdict #8: single-shot 100x point on the three cheapest "
            "dedup queries, honesty carried by the in-run co-tenant sampler "
            "(noise_cores_max per timed window) rather than repeats. "
            "Documents-only amplification (the chain reads no other table); "
            "same word-suffix transform as the 10x/30x studies."
        ),
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(study, f, indent=1)
    print(json.dumps({"flagged": flagged, "out": out_path}))


if __name__ == "__main__":
    main()
