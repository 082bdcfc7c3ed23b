"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, content fingerprinting.

All pure built-in `pyspark.sql.functions` expressions (whole-stage
codegen, no Python in the hot path), each with an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from barks_ocr_spark.kernels import textnorm as tn

# Function words used as the English signal for the n-gram-free
# heuristic language ID (stopword-hit-rate).
_EN_MARKERS = sorted(tn.STOP_WORDS)

# BPE-ish token regex: letter runs, digit runs, or single non-space
# symbols — a deterministic proxy for subword token counting.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def words_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def lang_id(docs: DataFrame, text_col: str = "text", threshold: float = 0.2) -> DataFrame:
    """Heuristic language ID: share of whitespace tokens that are English
    function words; ≥ threshold → 'en', else 'unknown'."""
    words = words_col(F.col(text_col))
    hits = F.size(F.filter(words, lambda w: w.isin(_EN_MARKERS)))
    total = F.size(words)
    ratio = F.when(total > 0, hits / total).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        ratio.alias("en_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, word count, mean word length,
    punctuation ratio, stopword ratio — the usual pretraining filters."""
    text = F.col(text_col)
    words = words_col(text)
    n_chars = F.length(text)
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(_EN_MARKERS)))
    mean_wlen = F.when(
        n_words > 0,
        (F.length(F.regexp_replace(text, r"\s+", "")) / n_words),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0).alias("punct_ratio"),
        F.when(n_words > 0, stop_hits / n_words).otherwise(0.0).alias("stopword_ratio"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    text = F.col(text_col)
    ws = F.size(words_col(text))
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


def canonical_text(text: Column) -> Column:
    """Fingerprint canonicalization: lowercase, strip non-alnum-space,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint (md5 of canonical text) — the
    exact-dedup / lineage key."""
    return docs.select(
        "doc_id",
        F.md5(canonical_text(F.col(text_col))).alias("fp"),
    )
