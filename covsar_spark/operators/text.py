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
