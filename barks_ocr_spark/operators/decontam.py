"""Benchmark decontamination: flag corpus documents whose text overlaps
an evaluation set by word n-grams — the standard pretraining hygiene
step (eval-set leakage detection by 8-to-13-gram collision).

100 TB shape: the eval set is small by construction (benchmarks are
thousands of documents, the corpus is trillions), so its distinct n-gram
set broadcasts and the corpus side never shuffles — the whole operator
is scan → project grams → broadcast semi-join → per-doc aggregate with
map-side partial aggregation on doc_id. If an eval set ever outgrew
broadcast range, the same plan degrades gracefully to a shuffled
semi-join on the gram hash; nothing else changes.

All gram construction is JVM-side (`sequence` + `slice` + `concat_ws`
inside whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from barks_ocr_spark.operators.textstats import canonical_text

DEFAULT_NGRAM = 5


def word_ngrams(text: Column, n: int = DEFAULT_NGRAM) -> Column:
    """Distinct word n-grams of the canonicalized text, as an array of
    space-joined strings. Documents shorter than ``n`` words yield an
    empty array (no partial grams — matches the usual decontam rule that
    a doc too short to hold one n-gram cannot collide)."""
    ws = F.split(canonical_text(text), " ")
    # start offsets 1..size-n+1. NOT sequence(1, greatest(size-n+1, 0)):
    # Spark's sequence(1, 0) counts DOWN to [1, 0] (default step -1), so
    # a short doc would emit bogus grams (and slice(_, 0, n) errors) —
    # docs under n words must take the explicit empty branch instead.
    starts = F.when(
        F.size(ws) >= n, F.sequence(F.lit(1), F.size(ws) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    )


def contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct word n-grams appear
    anywhere in ``eval_docs`` (doc_id, text). Returns only contaminated
    docs: (doc_id, n_grams, n_contaminated, contam_frac).

    Plan: eval grams → distinct → broadcast; corpus → explode distinct
    grams → broadcast LEFT SEMI join → count per doc → join back the
    per-doc gram totals computed in the same projection (no second scan:
    the total rides the exploded rows as a per-doc constant).
    """
    eval_grams = (
        eval_docs.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = corpus.select(
        "doc_id",
        F.size(word_ngrams(F.col(text_col), n)).alias("n_grams"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = doc_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
    return (
        hits.groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_contaminated"))
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
                "contam_frac"
            ),
        )
    )
