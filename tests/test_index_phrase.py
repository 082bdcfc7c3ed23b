"""Positional index + phrase search, and hyphen-duplicate integrity
(reference parity: tools/whoosh_find.py phrase queries,
pipeline/whoosh_index.py:138-146 check_cleaned_terms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barks_ocr_spark.kernels import textnorm as tn
from barks_ocr_spark.operators import index


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_adjacency(spark):
    assert "the" in tn.ALL_WORDS_TO_IGNORE  # fixture precondition
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma ends here"),
            (2, "alpha then beta gamma"),  # alpha beta NOT adjacent
            (3, "beta gamma beta gamma"),  # two starts
            (4, "gamma beta"),  # wrong order
            (5, "alpha the beta"),  # stopword occupies the slot between
        ],
    )
    pos = index.positional_index(docs)
    hits = {r["doc_id"]: r["n_matches"] for r in index.search_phrase(pos, "beta gamma").collect()}
    assert hits == {1: 1, 2: 1, 3: 2}
    # 3-term phrase
    hits3 = {r["doc_id"]: r["n_matches"] for r in index.search_phrase(pos, "alpha beta gamma").collect()}
    assert hits3 == {1: 1}
    # the stopword slot keeps alpha/beta non-adjacent in doc 5 (doc 1
    # has them truly adjacent and still matches)
    ab = {r["doc_id"] for r in index.search_phrase(pos, "alpha beta").collect()}
    assert ab == {1}
    # single-term phrase degrades to term search with occurrence count
    single = {r["doc_id"]: r["n_matches"] for r in index.search_phrase(pos, "beta").collect()}
    assert single == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_phrase_stopword_rejected(spark):
    pos = index.positional_index(_docs(spark, [(1, "alpha beta")]))
    with pytest.raises(ValueError):
        index.search_phrase(pos, "alpha the")
    with pytest.raises(ValueError):
        index.search_phrase(pos, "  ")


def test_phrase_positions_are_raw_slots(spark):
    # positions survive stop-word filtering: 'the' at slot 1 is skipped
    # but 'beta' keeps raw slot 2
    pos = index.positional_index(_docs(spark, [(1, "alpha the beta")]))
    got = {r["word"]: list(r["positions"]) for r in pos.collect()}
    assert got == {"alpha": [0], "beta": [2]}


def test_hyphen_duplicates_and_allowlist(spark):
    docs = _docs(
        spark,
        [
            (1, "bow-tie bowtie ice-cream re-print"),
            (2, "bow-tie reprint icecream"),
            (3, "bowtie ice-cream lone-hyphen"),
        ],
    )
    idx = index.inverted_index(docs)
    out = {
        r["term"]: (r["dehyphenated"], r["n_docs_term"], r["n_docs_dehyph"])
        for r in index.index_hyphen_duplicates(idx, allowed=["RE-PRINT"]).collect()
    }
    # lone-hyphen has no dehyphenated twin; re-print is allowlisted
    assert out == {
        "bow-tie": ("bowtie", 2, 2),
        "ice-cream": ("icecream", 2, 1),
    }
    # without the allowlist the artifact is reported
    with_all = {
        r["term"] for r in index.index_hyphen_duplicates(idx).collect()
    }
    assert with_all == {"bow-tie", "ice-cream", "re-print"}


def test_phrase_with_repeated_term(spark):
    # "beta beta" = consecutive duplicates: positions of the SAME term
    # shifted by 0 and 1 must intersect
    docs = _docs(
        spark,
        [
            (1, "beta beta gamma"),       # one start (pos 0)
            (2, "beta gamma beta"),       # none
            (3, "beta beta beta"),        # two starts (0 and 1)
        ],
    )
    pos = index.positional_index(docs)
    hits = {
        r["doc_id"]: r["n_matches"]
        for r in index.search_phrase(pos, "beta beta").collect()
    }
    assert hits == {1: 1, 3: 2}
