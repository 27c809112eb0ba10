"""Edge-case semantics of the text operators (round-4 review): contentless
documents must score zero / undefined, never 1-word phantoms; fingerprint
emits explicit NULL rows for sub-bigram docs; TF-IDF ranks by score."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _docs(spark, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    return spark.createDataFrame(pdf)


def test_empty_doc_scores_zero(spark):
    from covsar_spark.operators.text import quality_score, word_stats, words_col

    docs = _docs(spark, ["", "   ", "one", "the cat sat on the mat"])
    ws = word_stats(docs).toPandas().set_index("doc_id").sort_index()
    assert list(ws["n_words"]) == [0, 0, 1, 6]  # split('') used to give 1
    qs = quality_score(docs).toPandas().set_index("doc_id").sort_index()
    assert qs.loc[0, "quality"] == 0 and qs.loc[1, "quality"] == 0
    assert pd.isna(qs.loc[0, "uniq_ratio"]) and pd.isna(qs.loc[1, "stopword_ratio"])
    # non-empty docs keep well-defined ratios
    assert qs.loc[3, "uniq_ratio"] > 0
    sizes = docs.select(F.size(words_col()).alias("n")).toPandas()["n"].tolist()
    assert sizes == [0, 0, 1, 6]


def test_fingerprint_emits_null_for_short_docs(spark):
    from covsar_spark.operators.text import fingerprint

    docs = _docs(spark, ["", "solo", "two words"])
    fp = fingerprint(docs).toPandas().set_index("doc_id").sort_index()
    assert len(fp) == 3  # every doc has a row
    assert pd.isna(fp.loc[0, "fp"]) and pd.isna(fp.loc[1, "fp"])
    assert not pd.isna(fp.loc[2, "fp"])


def test_tfidf_ranks_by_score_not_tf(spark):
    """A rare term with a high idf must outrank a ubiquitous term with a
    slightly larger tf (the old integer-keyed ranking kept the stopword)."""
    from covsar_spark.operators.text import tfidf_topterms

    # 'common' appears in every doc (df=4, idf ~ 1); 'rare' only in doc 0
    texts = [
        "common common common common rare rare rare",
        "common x1 x2",
        "common y1 y2",
        "common z1 z2",
    ]
    out = tfidf_topterms(_docs(spark, texts), k=1).toPandas()
    top0 = out[out["doc_id"] == 0].iloc[0]
    assert top0["term"] == "rare"  # score 3*(ln(5/2)+1) ~ 5.7 beats 4*(ln(5/5)+1) = 4
