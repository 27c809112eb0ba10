"""ANN/near-dup evidence: exact block-matmul vs numpy brute force, LSH top-k
recall vs the exact ranking, and LSH near-dup recall vs the exact pair set."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from covsar_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
    near_dup_lsh,
    near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    # 12 well-separated cluster directions + per-vector noise: neighbors are
    # overwhelmingly same-cluster, so LSH recall is meaningful and stable
    rng = np.random.default_rng(99)
    n, dim, k = 400, 32, 12
    centers = rng.normal(0, 1, (k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, k, n)
    vecs = centers[lab] + rng.normal(0, 0.12, (n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float64).tolist() for v in vecs],
            "label": [f"c{int(x)}" for x in lab],
        }
    )
    sdf = spark.createDataFrame(pdf)
    sdf.persist().count()
    return sdf, vecs, lab


def _brute_pairs(vecs: np.ndarray, threshold: float) -> set[tuple[int, int]]:
    M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = M @ M.T
    out = set()
    n = len(M)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.add((i, j))
    return out


def test_near_dup_block_matmul_exact(emb_df):
    sdf, vecs, _ = emb_df
    got = near_dup_pairs(sdf, threshold=0.5, n_blocks=5).toPandas()
    want = _brute_pairs(vecs, 0.5)
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert got_set == want
    assert (got["id_a"] < got["id_b"]).all()
    # no duplicates: each unordered pair lands in exactly one block-pair task
    assert len(got) == len(got_set)


def test_near_dup_auto_blocking_exact(emb_df):
    """n_blocks auto-derived from corpus count x dim: forcing a tiny
    target_block_bytes (one 32-dim vector = 256 B; 4 KiB target -> 16-row
    blocks -> 25 blocks for 400 vectors) must leave the output identical —
    blocking only changes task granularity, never the pair set."""
    sdf, vecs, _ = emb_df
    got = near_dup_pairs(sdf, threshold=0.5, target_block_bytes=4096).toPandas()
    want = _brute_pairs(vecs, 0.5)
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert got_set == want
    assert len(got) == len(got_set)


def test_lsh_topk_recall(emb_df):
    sdf, _, _ = emb_df
    nq, k = 20, 10
    exact = cosine_topk(sdf, n_queries=nq, k=k).toPandas()
    approx = lsh_topk(sdf, n_queries=nq, k=k, n_planes=8).toPandas()
    e = {(int(r.query_id), int(r.neighbor_id)) for r in exact.itertuples()}
    a = {(int(r.query_id), int(r.neighbor_id)) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # multi-probe (Hamming-2) integer-plane LSH on clustered data:
    # measured ~0.78 on this fixture at 8 planes; 0.6 is the promised floor
    assert recall >= 0.6, f"lsh_topk recall@{k} = {recall:.3f}"


def test_near_dup_lsh_subset_and_recall(emb_df):
    sdf, vecs, _ = emb_df
    exact = _brute_pairs(vecs, 0.5)
    got = near_dup_lsh(sdf, threshold=0.5).toPandas()
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    # exact verification: no false positives, ever
    assert got_set <= exact
    recall = len(got_set) / len(exact)
    # 4 tables x 4 planes banding: measured ~0.76 on this fixture
    assert recall >= 0.5, f"near_dup_lsh recall = {recall:.3f}"


def test_ivf_topk_recall(emb_df):
    from covsar_spark.operators.similarity import ivf_topk

    sdf, _, _ = emb_df
    nq, k = 20, 10
    exact = cosine_topk(sdf, n_queries=nq, k=k).toPandas()
    approx = ivf_topk(sdf, n_queries=nq, k=k, n_lists=16, n_probe=4).toPandas()
    e = {(int(r.query_id), int(r.neighbor_id)) for r in exact.itertuples()}
    a = {(int(r.query_id), int(r.neighbor_id)) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # 4-probe of 16 lists on clustered data — measured ~0.9 on this fixture
    assert recall >= 0.7, f"ivf_topk recall@{k} = {recall:.3f}"


def test_lsh_bucket_deterministic_across_batches(spark):
    # same vector -> same bucket regardless of Arrow batch composition
    from covsar_spark.operators.similarity import lsh_bucket_udf

    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 16).tolist()
    pdf1 = pd.DataFrame({"embedding": [v]})
    pdf2 = pd.DataFrame({"embedding": [rng.normal(0, 1, 16).tolist() for _ in range(50)] + [v]})
    b = lsh_bucket_udf(8, 123)
    from pyspark.sql import functions as F

    b1 = spark.createDataFrame(pdf1).select(b(F.col("embedding")).alias("b")).first()["b"]
    b2 = spark.createDataFrame(pdf2).select(b(F.col("embedding")).alias("b")).collect()[-1]["b"]
    assert b1 == b2


def _planted_corpus(
    n_bg: int,
    n_pairs: int,
    dim: int = 64,
    sim: float = 0.90,
    seed: int = 7,
    pairs_first: bool = False,
):
    """Background unit vectors + n_pairs planted pairs at EXACT cosine
    ``sim`` (v = sim*u + sqrt(1-sim^2)*w with w unit-orthogonal to u).
    Random 64-dim background cosines are ~N(0, 1/64), so nothing else
    crosses a 0.55 threshold and planted recall is measured cleanly."""
    rng = np.random.default_rng(seed)
    bg = rng.normal(0, 1, (n_bg, dim))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    u = rng.normal(0, 1, (n_pairs, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.normal(0, 1, (n_pairs, dim))
    w -= np.einsum("ij,ij->i", w, u)[:, None] * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = sim * u + np.sqrt(1 - sim * sim) * w
    # pairs_first: u's get ids 0..n_pairs-1 (usable as ANN query ids with
    # their partner at id + n_pairs); else pairs sit after the background
    vecs = np.vstack([u, v, bg]) if pairs_first else np.vstack([bg, u, v])
    base = 0 if pairs_first else n_bg
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [x.tolist() for x in vecs],
            "label": ["x"] * len(vecs),
        }
    )
    planted = {(base + i, base + n_pairs + i) for i in range(n_pairs)}
    return pdf, planted


def test_auto_tables_holds_recall_at_10x(spark):
    """Round-5 verdict #4: auto_planes holds candidate volume ~linear but
    lets recall decay with corpus growth (measured 0.586 at the 10x corpus
    with the fixed 4 tables). auto_tables computes b from the banding
    identity at the declared (sim 0.90, recall 0.8) point AFTER plane
    resolution; at the 10x corpus (20.5k vectors -> 10 planes, 7 tables)
    planted-pair recall must clear the declared floor with auto knobs only
    (deterministic fixture: measured 0.820, banding prediction 0.812)."""
    from covsar_spark.operators.similarity import resolve_n_planes, resolve_n_tables

    pdf, planted = _planted_corpus(19500, 500)
    n = len(pdf)
    assert resolve_n_planes(n, 4, 32) == 10
    assert resolve_n_tables(10) == 7
    sdf = spark.createDataFrame(pdf)
    sdf.persist().count()
    try:
        got = near_dup_lsh(
            sdf, threshold=0.55, auto_planes=True, auto_tables=True, n_vecs=n
        ).toPandas()
    finally:
        sdf.unpersist()
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    recall = len(got_set & planted) / len(planted)
    assert recall >= 0.8, f"auto-knob recall at 10x = {recall:.3f}"


def test_auto_tables_reproduces_oracle_pin():
    """At the oracle-pinned 6 planes the banding identity resolves to the
    pinned 4 tables — the contract entry runs both auto knobs safely."""
    from covsar_spark.operators.similarity import resolve_n_tables

    assert resolve_n_tables(6, n_tables=4) == 4


def test_resolve_n_probe_anchor_growth_and_pin():
    """auto_probe resolver (round 7): at the oracle scales (16 lists) and
    at the measured 161-list anchor it resolves to the pinned 4 probes;
    past the anchor the required probes grow as sqrt(n_lists) from the
    measured miss-rate fit (see similarity.resolve_n_probe docstring);
    a higher declared recall target asks for more probes, matching the
    measured curve (0.926 at P=8 -> target 0.9 needs P=7)."""
    from covsar_spark.operators.similarity import resolve_n_probe

    assert resolve_n_probe(16) == 4      # oracle-pinned driver scales
    assert resolve_n_probe(161) == 4     # the measured anchor itself
    assert resolve_n_probe(481) == 7     # 30x corpus (validated by study)
    assert resolve_n_probe(1610) == 13   # 100x direction: ~sqrt growth
    assert resolve_n_probe(161, target_recall=0.9) == 7


def test_ivf_auto_lists_holds_recall_at_10x(spark):
    """Sibling measurement to the LSH auto_tables test: under auto_lists the
    probed FRACTION of the corpus shrinks as it grows (161 lists at 20.5k
    vectors, n_probe=4 probes 2.5%), yet the md5-conical quantizer localizes
    sim-0.90 partners well enough that planted-pair top-1 recall clears 0.8
    at the auto-resolved probe count (deterministic fixture: measured 0.806;
    full curve 0.806/0.926/0.988/1.0 at probes 4/8/16/32 —
    BENCH_SCALE_STUDY.json ivf_recall_10x). Round 7: the entry runs with
    AUTO KNOBS ONLY (auto_lists + auto_probe) — no manual recall knob."""
    from covsar_spark.operators.similarity import (
        ivf_topk,
        resolve_n_lists,
        resolve_n_probe,
    )

    n_pairs = 500
    pdf, _ = _planted_corpus(19500, n_pairs, pairs_first=True)
    n = len(pdf)
    assert resolve_n_lists(n) == 161
    assert resolve_n_probe(161) == 4
    sdf = spark.createDataFrame(pdf)
    sdf.persist().count()
    try:
        got = ivf_topk(
            sdf, n_queries=n_pairs, k=10, auto_lists=True, auto_probe=True,
            n_vecs=n,
        ).toPandas()
    finally:
        sdf.unpersist()
    top = got[got["rank"] == 1]
    hits = sum(
        1
        for r in top.itertuples()
        if int(r.neighbor_id) == int(r.query_id) + n_pairs
    )
    recall = hits / n_pairs
    assert recall >= 0.8, f"ivf auto_lists planted top-1 recall = {recall:.3f}"


def test_lsh_topk_multitable_recall_at_10x(spark):
    """The top-k analogue of the near_dup auto knobs (round 6): fixed
    8 planes probe 14% of bucket space, so per-query candidates grow
    linearly with the corpus. auto_planes deepens P to hold the candidate
    budget (~2048) and n_tables buys the recall back: at the 10x corpus,
    4 tables auto-resolve to P=12 (~1.6k candidates/query) and read
    planted top-1 recall 1.000 vs the fixed single-table form's 0.897 at
    2.9k candidates (deterministic fixture; floor asserted at 0.9)."""
    from covsar_spark.operators.similarity import lsh_topk, resolve_planes_topk

    n_pairs = 300
    pdf, _ = _planted_corpus(19900, n_pairs, pairs_first=True)
    n = len(pdf)
    assert resolve_planes_topk(n, 8, 4, 2048) == 12
    sdf = spark.createDataFrame(pdf)
    sdf.persist().count()
    try:
        got = lsh_topk(
            sdf, n_queries=n_pairs, k=10, n_tables=4, auto_planes=True, n_vecs=n
        ).toPandas()
    finally:
        sdf.unpersist()
    top = got[got["rank"] == 1]
    hits = sum(
        1
        for r in top.itertuples()
        if int(r.neighbor_id) == int(r.query_id) + n_pairs
    )
    recall = hits / n_pairs
    assert recall >= 0.9, f"multi-table lsh_topk top-1 recall at 10x = {recall:.3f}"
