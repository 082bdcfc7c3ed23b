"""Inverted full-text index (SURVEY.md A5/T13/O8) — Spark-native.

The reference builds `word → title → page → count` with a Python dict
(`experiments/make-word-index-from-gemini-ai-groups.py:184-194`) and
ships Whoosh for production search (`pipeline/whoosh_index.py:260-269`).
Here the index IS a DataFrame: explode(tokenize) → groupBy(word, doc)
.count(). Aggregation is partially applied map-side (hash aggregate), so
the shuffle carries (word, doc, partial_count) — at 100 TB this is the
canonical scalable inverted-index build. Search = a filter on the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from barks_ocr_spark.kernels import textnorm as tn

# Exact Spark translation of the reference tokenizer
# (make-word-index-from-gemini-ai-groups.py:251-265): lowercase; fold
# em-dash and ellipsis to space; strip the punctuation set; whitespace
# split; drop stop/unimportant words. All JVM-side (whole-stage codegen).
_PUNCT_RE = '["!=?,:;.<>/()*&%$#]'


def tokens_col(text: Column) -> Column:
    """Array-of-words column implementing the T13 tokenizer."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"—|\.\.\.", " ")
    t = F.regexp_replace(t, _PUNCT_RE, "")
    return F.split(F.trim(t), r"\s+")


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per kept token occurrence: (doc_id, word)."""
    stop = sorted(tn.ALL_WORDS_TO_IGNORE)
    return (
        docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").isin(stop))
    )


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, doc_id, cnt) — the word-count inverted index (A5)."""
    return (
        tokenize(docs, text_col)
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("cnt"))
    )


def word_doc_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, doc_freq, total_occurrences) corpus statistics."""
    return (
        tokenize(docs, text_col)
        .groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("total_occurrences"),
        )
    )


def tf_idf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, doc_id, tf_idf) — corpus-weighted term scores:
    tf_idf = cnt × ln(N / doc_freq), N = corpus document count.

    Plan shape: the inverted index (fact) joins the per-word document
    frequencies (dim — vocabulary-sized, broadcast) so the fact table
    never reshuffles; N is a driver scalar from one distributed count,
    folded in as a literal. ln() is IEEE-deterministic, so the score is
    exactly reproducible cross-engine (DuckDB oracle)."""
    from barks_ocr_spark.operators.cacheutil import persist_tracked

    idx = persist_tracked(inverted_index(docs, text_col))
    n_docs = docs.count()
    dfreq = (
        idx.groupBy("word").agg(F.countDistinct("doc_id").alias("_df"))
    )
    score = F.col("cnt") * F.log(F.lit(float(n_docs)) / F.col("_df"))
    return (
        idx.join(F.broadcast(dfreq), "word")
        .select("word", "doc_id", score.alias("tf_idf"))
    )


def search(index: DataFrame, word: str) -> DataFrame:
    """Term lookup on the index table (the Whoosh-query analogue,
    `src/barks_ocr/tools/whoosh_find.py` behavior): docs containing
    ``word``, highest count first."""
    return index.filter(F.col("word") == word.lower()).orderBy(
        F.desc("cnt"), "doc_id"
    )


def index_integrity_missing_terms(index: DataFrame, terms: list[str]) -> DataFrame:
    """Index integrity check (`pipeline/whoosh_index.py:33-57`): curated
    terms that are NOT findable in the index. Empty result = healthy."""
    spark = index.sparkSession
    curated = spark.createDataFrame(
        [(t.lower(),) for t in terms], "term string"
    )
    return curated.join(
        index.select(F.col("word")).distinct(),
        curated.term == F.col("word"),
        "left_anti",
    )
