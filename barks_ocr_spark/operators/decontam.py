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

All gram construction is JVM-side — one RE2 lookahead-window pass per
document (dedup.shingles_from_text) — no Python in the hot path.

Expression-cost history (two measured traps, both still relevant to
anyone re-shaping this plan): (1) grams must NOT be built as
``transform(sequence(...), i -> slice(ws, i, n))`` with ``ws`` an
inline split/regex tree — the lambda body re-evaluates the whole
canonicalization PER ELEMENT, and if ``size(grams)`` and
``explode(grams)`` are then selected as sibling expressions the
optimizer recomputes the full gram build once per exploded row on top
(O(words²) regex passes per document; sf0.1 went from ~1 s to 10+ min).
`contamination` therefore materializes ``grams`` as a column so
`size`/`explode` reference an attribute Catalyst will not re-inline.
(2) The interim fix — a chain of n ``zip_with`` shifted slices — was
linear but still paid n interpreted higher-order passes per row;
the single-regex form is 6.3× faster at n=8 (see word_ngrams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from barks_ocr_spark.operators.textstats import canonical_text

# The low end of the standard 8-to-13-gram collision window the module
# docstring cites; pass a smaller n explicitly for tiny-vocabulary test
# corpora (the registry query uses n=3 for exactly that reason — see
# plans/queries.q_contamination).
DEFAULT_NGRAM = 8


def word_ngrams(text: Column, n: int = DEFAULT_NGRAM) -> Column:
    """Distinct word n-grams of the canonicalized text, as an array of
    space-joined strings, in first-occurrence order. Documents shorter
    than ``n`` words yield an empty array (no partial grams — the usual
    decontam rule that a doc too short to hold one n-gram cannot
    collide). A NULL text also yields an empty array (the zip_with
    formulation returned SQL NULL; no consumer distinguished them —
    explode of either is zero rows).

    Delegates to the single-regex-pass shingle builder
    (dedup.shingles_from_text): one C-side RE2 scan with a lookahead
    window capture, replacing this module's original chain of n
    ``zip_with`` shifted slices — measured 6.3× faster at n=8 on sf0.1
    (3.76 s → 0.60 s for the corpus gram build) with byte-identical
    output on every document (same canonicalization, same
    first-occurrence distinct order; cross-checked corpus-wide)."""
    from barks_ocr_spark.operators.dedup import shingles_from_text

    return shingles_from_text(text, n)


def contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct word n-grams appear
    anywhere in ``eval_docs`` (doc_id, text). Returns only contaminated
    docs: (doc_id, n_grams, n_contaminated, contam_frac).

    Plan: eval grams → distinct → broadcast; corpus → grams column
    (built once per doc — see the module docstring) → size + explode →
    broadcast LEFT SEMI join → count per doc. The per-doc total rides
    the exploded rows as a carried attribute, so there is no second
    scan and no join back. The semi-join keys on ``xxhash64(gram)``
    (r7, guide §2.3): the broadcast set holds 8-byte longs instead of
    n-word strings and every probe hashes a long, not a string — the
    same keying discipline (and the same ~|corpus grams|·|eval
    grams|/2⁶⁴ false-positive odds, vanishing at any real scale) as
    remove_repeated_chunks; the text-keyed DuckDB oracle agrees at
    every test scale.
    """
    eval_grams = (
        eval_docs.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .select(F.xxhash64("gram").alias("_g"))
        .distinct()
    )
    grams = corpus.select(
        "doc_id", word_ngrams(F.col(text_col), n).alias("grams")
    )
    # hash INSIDE the array, then explode longs: exploding a long array
    # avoids the per-row UTF8 string copies of exploding gram text
    # (measured 1.95 s → 0.42 s for the corpus gram stream at sf1.0)
    doc_grams = grams.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode(
            F.transform("grams", lambda x: F.xxhash64(x))
        ).alias("_g"),
    )
    hits = doc_grams.join(F.broadcast(eval_grams), "_g", "left_semi")
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


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """End-to-end decontamination: drop every corpus document with at
    least ``min_hits`` eval-set n-gram collisions, returning the
    surviving rows with their full schema — the removal counterpart of
    :func:`contamination` (which only flags), mirroring how
    ``dedup_corpus`` turns pair-finding into a survivor list.

    Plan: flag (broadcast semi-join against eval grams, see
    `contamination`) → distinct flagged doc_ids → LEFT ANTI against the
    corpus. The flagged list is usually tiny (it is bounded by how much
    of the CORPUS collides, not by the eval set's size — a small n or
    very common grams can flag a large corpus fraction), so the anti-join
    side is left to AQE: it broadcasts when the runtime size allows and
    degrades to a shuffled anti-join when it doesn't, instead of a forced
    hint OOMing the driver on a pathological flag rate. At 100 TB this is
    one corpus scan for flagging and one for the anti-join."""
    flagged = (
        contamination(corpus, eval_docs, n, text_col)
        .filter(F.col("n_contaminated") >= min_hits)
        .select("doc_id")
    )
    return corpus.join(flagged, "doc_id", "left_anti")
