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
    """Whitespace tokenization of trimmed text (BPE-ish regex split)."""
    return F.split(F.trim(F.col(text_col)), WORD_SPLIT)


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
    stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    uniq = F.size(F.array_distinct(w))
    mean_len = (F.length(F.regexp_replace(F.trim(F.col("text")), WORD_SPLIT, "")) / n_words)
    score = (
        F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1)).otherwise(F.lit(0))
        + F.when(stop / n_words >= 0.05, F.lit(1)).otherwise(F.lit(0))
        + F.when(uniq / n_words >= 0.3, F.lit(1)).otherwise(F.lit(0))
        + F.when(n_words >= 10, F.lit(1)).otherwise(F.lit(0))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop / n_words, 6).alias("stopword_ratio"),
        F.round(uniq / n_words, 6).alias("uniq_ratio"),
        F.round(mean_len, 6).alias("mean_word_len"),
        score.cast("int").alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram-heuristic language ID: English stopword hit-rate threshold."""
    w = words_col()
    ratio = F.size(F.filter(w, lambda x: F.lower(x).isin(*EN_STOPWORDS))) / F.size(w)
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
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = docs.select("doc_id", F.explode(bigrams).alias("bg"))
    return (
        exploded.groupBy("doc_id")
        .agg(F.expr("bit_xor(cast(conv(substring(md5(bg), 1, 15), 16, 10) as bigint))").alias("fp"))
    )


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
    pipeline. Ranking uses PURE INTEGER keys (tf desc, df asc, term asc) so
    engine order is float-drift-free; the reported score is the float.

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
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
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
