"""Token-domain operators over the pre-tokenized training-sequence table
(doc_id, tokens array<int32>, n_tok, source — BASELINE.json:input_hint):
vocabulary statistics and sequence packing, the two table-wide passes every
large-scale training-data pipeline runs before a training job.

Both are pure DataFrame compositions with exact DuckDB oracles (tokens are
derived from document words via the shared md5 hash, so both engines see the
identical token stream).

Scale notes:
- vocab_topk: explode(tokens) -> groupBy(token) count is THE canonical
  skew-prone aggregation (Zipf tokens); it partial-aggregates map-side, so
  the shuffle carries at most |vocab| x partitions rows, not the corpus.
- pack_sequences: greedy deterministic packing — docs ordered per source,
  running token cumsum, bin = floor(cumsum / capacity). One window pass +
  one grouped aggregate; first-fit-decreasing quality is traded for
  determinism + a relational plan (the oracle must replay it exactly).
  The per-source cumsum window is a single reducer per source; the
  ``chunk`` argument switches to a two-level distributed prefix sum whose
  per-task bound is the chunk, not the source (round-5, closing the one
  documented-but-untested skew point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def vocab_topk(tokens: DataFrame, k: int = 20) -> DataFrame:
    """Top-k token ids by frequency per source: (source, rank, token, n).
    Ties break toward the smaller token id so ranking is engine-exact."""
    freq = (
        tokens.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("source").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "token", "n")
    )


def unigram_logprob(tokens: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean negative log unigram
    probability, with probabilities from the corpus's own token frequencies
    — the classic cheap LM filter for training-data curation. Two passes:
    one global frequency aggregate (broadcast back — |vocab| rows), one
    explode + join + per-doc mean. Output: (doc_id, source, n_tok,
    mean_nll) — high mean_nll = rare-token-heavy document."""
    tok = tokens.select("doc_id", "source", "n_tok", F.explode("tokens").alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("total"))
    p = freq.crossJoin(F.broadcast(total)).select(
        "token", (F.col("n") / F.col("total")).alias("p")
    )
    return (
        tok.join(F.broadcast(p), "token")
        .groupBy("doc_id", "source", "n_tok")
        .agg(F.round(F.avg(-F.log("p")), 6).alias("mean_nll"))
    )


def pack_sequences(tokens: DataFrame, capacity: int = 2048, chunk=None) -> DataFrame:
    """Greedy sequence packing into fixed-capacity training bins:
    per source, docs in doc_id order are assigned bin = floor((cumsum(n_tok)
    - n_tok) / capacity) — each doc lands in the bin its starting offset
    falls in (docs longer than capacity span bins; they count toward the bin
    they start in). Output: one row per (source, bin) with the packed doc
    count, token total, and fill ratio.

    ``chunk=None`` runs the single-window form: `Window.partitionBy(source)`
    is ONE reducer per source, so the largest source bounds the task (the
    skew point documented since round 2). Pass ``chunk`` — a Column that is
    monotone NON-DECREASING in doc_id order (e.g. a block of the numeric
    doc-id suffix) — to run the salted two-level distributed prefix sum
    instead: per-(source, chunk) local cumsums in parallel, a tiny
    per-source window over chunk TOTALS (one row per chunk, not per doc),
    and an equi-join on (source, chunk) adding each chunk's exclusive
    offset back (join strategy left to the optimizer — see in-line note). The
    result is identical by associativity of the integer cumsum (pinned in
    tests/test_tokens.py), and the per-task bound drops from max source
    size to max chunk size."""
    n_tok = F.col("n_tok").cast("long").alias("n_tok")
    if chunk is None:
        w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        binned = tokens.select(
            "source",
            "doc_id",
            n_tok,
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / capacity).cast("long").alias("bin"),
        )
    else:
        t = tokens.select("source", "doc_id", n_tok, chunk.cast("long").alias("_chunk"))
        wl = (
            W.partitionBy("source", "_chunk")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        local = t.withColumn("_cum_local", F.sum("n_tok").over(wl))
        # chunk totals: |sources| x |chunks| rows — the only per-source
        # sequential pass runs over these, never over docs
        wo = W.partitionBy("source").orderBy("_chunk").rowsBetween(W.unboundedPreceding, -1)
        offsets = (
            t.groupBy("source", "_chunk")
            .agg(F.sum("n_tok").alias("_ct"))
            .select(
                "source",
                "_chunk",
                F.coalesce(F.sum("_ct").over(wo), F.lit(0)).alias("_off"),
            )
        )
        # no broadcast hint (round-5 advice): offsets has |sources| x
        # |chunks| ~ n_docs/chunk_size rows — linear in the corpus, so a
        # forced broadcast becomes a driver-memory bomb at exactly the
        # scales this path targets. Left to the optimizer, small offset
        # tables still auto-broadcast under autoBroadcastJoinThreshold;
        # large ones take a shuffle join on (source, _chunk), which stays
        # bounded by chunk size per task.
        binned = local.join(offsets, ["source", "_chunk"]).select(
            "source",
            "doc_id",
            "n_tok",
            F.floor((F.col("_off") + F.col("_cum_local") - F.col("n_tok")) / capacity)
            .cast("long")
            .alias("bin"),
        )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sum("n_tok") / float(capacity), 6).alias("fill_ratio"),
    )
