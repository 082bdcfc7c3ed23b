"""Explicit skew handling: salted shuffle joins + ordered book assembly.

The north rule requires "partitioning / shuffle / skew handled
explicitly". AQE's skew-join splitting (on in session.py) repairs
sort-merge joins whose post-shuffle partitions are observably oversized,
but it is a runtime patch: it cannot split a hot key that must be
grouped, and a plan that only works when AQE notices is not a plan. The
operators here make the skew strategy part of the logical plan:

- :func:`salted_join` — the textbook salt: split each hot fact key
  across B reducers, replicate the dim B×.
- :func:`assemble_book_spans` — per-book ordered span assembly from
  per-page rows (the Spark shape of the reference's whole-book build
  from per-page OCR files, `books/src/book_pages.py:33-60`), with the
  skew analysis of *why salting is deliberately not used* documented on
  the operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def fact_salt(salt_src: Column | str, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets).

    ``salt_src`` must be a stable per-row column (event_id, page_no) —
    never ``rand()`` or ``monotonically_increasing_id()``: a retried
    task would re-salt its rows differently, silently dropping/dup'ing
    join matches and breaking the engine's exactly-once story.
    """
    return F.pmod(F.xxhash64(F.col(salt_src) if isinstance(salt_src, str) else salt_src), F.lit(buckets)).cast("int")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt_src: str | Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equi-join: facts get a deterministic salt, the dim is
    replicated ``buckets``× (one copy per salt value), and the join key
    becomes (key, salt) — so a key owning 30% of the fact table spreads
    over ``buckets`` reducers instead of melting one.

    Cost model (why this shape): shuffle volume for the fact side is
    unchanged; the dim side grows ``buckets``× — which is why the
    *small* side is the replicated one. Use when the dim is too big to
    broadcast (broadcast is always preferred when it fits — see the
    dims in plans/queries.py) and the fact-key histogram is heavy-tailed
    enough that AQE's after-the-fact splitting is not a plan you want to
    rely on.

    Join types: 'inner' and 'left' (facts-preserving) — the dim
    replication makes right/full semantics wrong (a dim row unmatched
    under one salt is not unmatched overall), so they are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.withColumn(SALT_COL, fact_salt(salt_src, buckets))
    d = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, on=[*keys, SALT_COL], how=how).drop(SALT_COL)


def paginate_spans(docs: DataFrame, page_size: int = 4) -> DataFrame:
    """(doc_id, spans) → (doc_id, page_no, page_spans): chunk each book's
    span array into fixed-size pages. Pure intra-row (`slice` over a
    `sequence` + posexplode) — zero shuffles; the inverse of
    :func:`assemble_book_spans`, used by tests and the round-trip oracle.

    A book with an empty span array still yields one (empty) page so the
    doc survives the round trip.
    """
    n_pages = F.greatest(
        F.ceil(F.size("spans") / F.lit(page_size)).cast("int"), F.lit(1)
    )
    pages = F.transform(
        F.sequence(F.lit(0), n_pages - 1),
        lambda i: F.slice("spans", i * page_size + 1, page_size),
    )
    return docs.select(
        "doc_id", F.posexplode(pages).alias("page_no", "page_spans")
    )


def assemble_book_spans(
    pages: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page_no",
    spans_col: str = "page_spans",
) -> DataFrame:
    """Per-page span rows → one ordered, re-offset span array per book
    (reference: whole-book text assembled from per-page OCR JSONs in
    filename order, `books/src/book_pages.py:33-60`; order here is
    ``page_col``, then each page's internal span order).

    Skew analysis — why this groupBy is deliberately NOT salted: the
    output row carries every span of the book, so the final reducer's
    memory is bounded by book size however the shuffle is keyed; a
    salted two-stage collect adds a second shuffle without lowering that
    bound. What actually protects a hot book here is collect_list's
    partial aggregation (ObjectHashAggregate): each map task pre-collects
    its share of the book's pages, so the doc_id shuffle moves one
    partial list per (mapper, book), not one record per page. A book too
    big for one reducer's memory is too big to emit as a row — cap
    upstream (or keep such docs as single rows, where they cost one
    straggler task, not a hot shuffle key).

    Output offsets are renumbered 0..n-1 across the whole book
    (span-sequence equality key: kind, text, media_ref, order).
    """
    page_struct = F.struct(
        F.col(page_col).alias("page_no"), F.col(spans_col).alias("ps")
    )
    agg = pages.groupBy(id_col).agg(
        F.sort_array(F.collect_list(page_struct)).alias("pp")
    )
    allspans = F.flatten(F.transform("pp", lambda p: p["ps"]))
    spans = F.transform(
        allspans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return agg.select(id_col, spans.alias("spans"))
