"""Text analysis over the documents table: tokenization, quality scoring,
language ID, fingerprinting. All pure built-in column expressions (JVM-side,
whole-stage codegen) — no UDFs — and every operator has an exact DuckDB
oracle (hashing is md5-based because both engines share it bit-for-bit).

These are the training-data-pipeline companions to the rollup engine: at
100 TB they run as a single scan + narrow projections (no shuffle except the
explode+agg fingerprints, which partial-aggregate map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic 60-bit hash both Spark and DuckDB compute identically:
#   spark:  conv(substr(md5(x), 1, 15), 16, 10) cast bigint
#   duckdb: ('0x' || substr(md5(x), 1, 15))::BIGINT
def md5_int60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# 40-bit variant for arithmetic hashing (a*h+b stays < 2^46: DuckDB raises on
# int64 overflow while Spark wraps, so headroom is a correctness requirement)
def md5_int40(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 10), 16, 10).cast("long")


WORD_SPLIT = r"\s+"

EN_STOPWORDS = (
    "the a an and or of to in is are was were be for on with as at by it "
    "this that from not have has had but they you we he she i"
).split()


def words_col(text_col="text") -> F.Column:
    """Whitespace tokenization of trimmed text (BPE-ish regex split).
    Empty/whitespace-only text yields an EMPTY array — Spark's split returns
    [""] there, which scored contentless docs n_words=1 / uniq_ratio=1.0
    (round-4 review); the SQL oracle applies the same empty-token filter."""
    return F.array_remove(F.split(F.trim(F.col(text_col)), WORD_SPLIT), "")


def word_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting + basic shape stats."""
    w = words_col()
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.array_distinct(w)).alias("n_uniq_words"),
        F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")).alias("n_punct"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality: stopword ratio + mean word length band + uniqueness
    (Gopher-style rules, public). Rounded so the float is oracle-stable."""
    w = words_col()
    n_words = F.size(w)
    # NULL denominators for empty docs: every ratio is undefined (NULL) and
    # every CASE below scores 0 — a contentless doc gets quality 0
    den = F.when(n_words > 0, n_words)
    stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    uniq = F.size(F.array_distinct(w))
    mean_len = (F.length(F.regexp_replace(F.trim(F.col("text")), WORD_SPLIT, "")) / den)
    score = (
        F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1)).otherwise(F.lit(0))
        + F.when(stop / den >= 0.05, F.lit(1)).otherwise(F.lit(0))
        + F.when(uniq / den >= 0.3, F.lit(1)).otherwise(F.lit(0))
        + F.when(n_words >= 10, F.lit(1)).otherwise(F.lit(0))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop / den, 6).alias("stopword_ratio"),
        F.round(uniq / den, 6).alias("uniq_ratio"),
        F.round(mean_len, 6).alias("mean_word_len"),
        score.cast("int").alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram-heuristic language ID: English stopword hit-rate threshold."""
    w = words_col()
    ratio = F.size(F.filter(w, lambda x: F.lower(x).isin(*EN_STOPWORDS))) / F.when(
        F.size(w) > 0, F.size(w)
    )
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: XOR over hashed word bigrams
    (rolling-hash analogue; bigrams make it order-sensitive without
    positional indexing, keeping the SQL oracle exact)."""
    w = words_col()
    # greatest(.., 0): an empty/1-word doc gives size-1 = -1 or 0, and
    # slice() raises on negative lengths (ANSI) — clamp to an empty slice
    n_bg = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, 1, n_bg),
        F.slice(w, 2, n_bg),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = docs.select("doc_id", F.explode(bigrams).alias("bg")).select(
        "doc_id", md5_int60(F.col("bg")).alias("h")
    )
    agg = exploded.groupBy("doc_id").agg(F.expr("bit_xor(h)").alias("fp"))
    # docs with < 2 words have no bigrams: emit an explicit fp=NULL row so
    # downstream joins keyed on fingerprint output never silently lose them
    return docs.select("doc_id").join(agg, "doc_id", "left")


def ngrams_col(n: int, text_col: str = "text") -> F.Column:
    """Word n-grams as an array column (JVM-side zip_with slices — the same
    construction dedup.shingles uses, without the distinct)."""
    w = words_col(text_col)
    n_g = F.greatest(F.size(w) - n + 1, F.lit(0))
    parts = [F.slice(w, i + 1, n_g) for i in range(n)]
    g = parts[0]
    for p in parts[1:]:
        g = F.zip_with(g, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return g


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (public rules; Rae et al. 2021):
    per-doc fraction of all 2-grams occupied by the MOST FREQUENT 2-gram,
    and fraction of 3-gram occurrences that are duplicates (appear >1 time).
    High values flag boilerplate/spammy documents for the training-data
    filter. Two explode+agg passes, both partial-aggregated map-side — the
    same scan shape as vocab_topk, linear at corpus scale."""
    g2 = docs.select("doc_id", F.explode(ngrams_col(2)).alias("g"))
    c2 = g2.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    s2 = c2.groupBy("doc_id").agg(
        F.sum("c").alias("n_2grams"), F.max("c").alias("top2")
    )
    g3 = docs.select("doc_id", F.explode(ngrams_col(3)).alias("g"))
    c3 = g3.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    s3 = c3.groupBy("doc_id").agg(
        F.sum("c").alias("n_3grams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup3"),
    )
    return (
        s2.join(s3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_2grams").cast("long").alias("n_2grams"),
            F.round(F.col("top2") / F.col("n_2grams"), 6).alias("top2_frac"),
            F.round(
                F.coalesce(F.col("dup3") / F.nullif(F.col("n_3grams"), F.lit(0)), F.lit(0.0)), 6
            ).alias("dup3_frac"),
        )
    )


def tfidf_topterms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc top-k terms by TF-IDF (smoothed sklearn-style idf =
    ln((N+1)/(df+1)) + 1) — keyword extraction for the training-data
    pipeline. Ranking is by the 4dp-ROUNDED score (desc, term asc): ranking
    by raw tf with df as a mere tie-break (the earlier form) let the idf
    factor never influence which terms were kept, so stopwords with max tf
    crowded out rare high-score terms (round-4 review). Rounding before
    ranking keeps the order engine-deterministic — the same convention the
    ANN entries use on raw cosine floats.

    Scale: tf is one explode+agg on (doc_id, word) — partial-aggregated;
    df is an agg of the tf table (no second scan); N is a 1-row broadcast.
    The per-doc top-k window partitions by doc_id — the same key tf is
    already partitioned by, so no extra shuffle."""
    from pyspark.sql import Window as W

    w = words_col()
    tf = (
        docs.select("doc_id", F.explode(w).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1.0),
                4,
            ),
        )
    )
    rk = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score").cast("double").alias("score"),
        )
    )
