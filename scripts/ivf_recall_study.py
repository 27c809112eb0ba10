"""IVF recall under auto_lists growth (round-6 follow-on to the r5/r6 LSH
banding work): with md5-conical centroids the list count auto-scales to hold
per-query candidate volume (n_probe * target_list), so the probed FRACTION
of the corpus shrinks as it grows — recall at fixed n_probe must therefore
decay. This study MEASURES the operating curve at the 10x corpus so the
trade is documented with numbers, not an argument (the near-dup scale path
is LSH + auto_tables, which holds recall by the banding identity; IVF's
fixed-candidate mode is the latency-priority option).

Planted ground truth: same construction as the LSH recall test — pairs at
exact cosine 0.90; recall = planted partners found in the query's top-k.

Usage: python scripts/ivf_recall_study.py [n_bg] [n_pairs]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from covsar_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
    resolve_n_lists,
    resolve_n_probe,
)
from covsar_spark.session import get_spark  # noqa: E402


def planted_corpus(n_bg: int, n_pairs: int, dim: int = 64, sim: float = 0.90, seed: int = 7):
    rng = np.random.default_rng(seed)
    bg = rng.normal(0, 1, (n_bg, dim))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    u = rng.normal(0, 1, (n_pairs, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.normal(0, 1, (n_pairs, dim))
    w -= np.einsum("ij,ij->i", w, u)[:, None] * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = sim * u + np.sqrt(1 - sim * sim) * w
    vecs = np.vstack([u, v, bg])  # queries first: vec_id < n_pairs are the u's
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [x.tolist() for x in vecs],
            "label": ["x"] * len(vecs),
        }
    )
    return pdf


def main():
    # --auto: measure ONLY the auto_probe operating point (round-7
    # validation of resolve_n_probe's sqrt growth law at a larger corpus,
    # e.g. `ivf_recall_study.py 60500 500 --auto` = the 30x point)
    auto_only = "--auto" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--auto"]
    n_bg = int(args[0]) if args else 19500
    n_pairs = int(args[1]) if len(args) > 1 else 500
    spark = get_spark("ivf_recall", cores=16, shuffle_partitions=16)
    pdf = planted_corpus(n_bg, n_pairs)
    n = len(pdf)
    sdf = spark.createDataFrame(pdf)
    sdf.persist().count()
    lists = resolve_n_lists(n)
    probes = [resolve_n_probe(lists)] if auto_only else [4, 8, 16, 32]
    rows = []
    for n_probe in probes:
        got = ivf_topk(
            sdf, n_queries=n_pairs, k=10, n_probe=n_probe,
            auto_lists=True, n_vecs=n,
        ).toPandas()
        top = got[got["rank"] == 1]
        hit = {
            int(r.query_id)
            for r in top.itertuples()
            if int(r.neighbor_id) == int(r.query_id) + n_pairs
        }
        rows.append(
            {
                "n_probe": n_probe,
                "n_lists": lists,
                "auto_probe": auto_only,
                "probed_frac": round(n_probe / lists, 4),
                "recall_planted_top1": round(len(hit) / n_pairs, 3),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"n": n, "n_pairs": n_pairs, "curve": rows}))


if __name__ == "__main__":
    main()
