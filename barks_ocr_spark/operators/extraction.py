"""The flagship extraction job: interleaved docs → ordered span arrays.

Physical shape (designed for a 10^12-doc table):

  Pass 1 (tiny shuffle): heading candidates → groupBy(variant)
      .agg(countDistinct(doc_id)) → filter ≥3. Candidates are rare
      (headers/page-number-shaped spans only) and short strings, so this
      aggregate is a few MB at any corpus size; the surviving set is
      collected and broadcast (`books/src/book_pages.py:295-321`'s
      two-pass repeated-heading rule, distributed).

  Pass 2 (narrow, shuffle-free): mapInPandas over the docs table runs the
      whole per-document kernel (kernels/spans.py) on Arrow batches. Every
      document's work is intra-row, so this stage scales linearly with
      executors — no join, no shuffle, no skewed keys. Skewed giant docs
      (splash pages with 100× spans) are stragglers, not hot shuffle
      keys; `repartition(doc_id)` before the kernel spreads them evenly.

All string work is vectorized pandas inside the batch — no per-row
Python UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barks_ocr_spark.kernels import spans as span_kernel
from barks_ocr_spark.kernels import textnorm as tn
from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA

_CANDIDATE_SCHEMA = "doc_id string, variant string"

# JVM translations of the kernels/textnorm boilerplate predicates —
# anchored Java-regex forms of the same patterns (parity guarded by the
# Spark-vs-golden e2e tests, which compute the repeating set through the
# pandas kernel and require byte-identical final spans).
_PAGE_NUM_TOKEN = r"(?:[ivxlcdmIVXLCDM]{1,8}|\d{1,3})"
_HEADER_SHAPE_RE = rf"^(?:{_PAGE_NUM_TOKEN}\s+\S.*|\S.*\s+{_PAGE_NUM_TOKEN})$"


def heading_candidates(docs: DataFrame) -> DataFrame:
    """(doc_id, variant) candidate pairs — pure JVM expressions.

    This pass touches every span of every document, so it must scale like
    a scan: explode + rlike keeps it inside whole-stage codegen with no
    Python workers (the earlier mapInPandas variant pinned ~13s of
    Arrow+pandas flatten cost per run that did not parallelize away).
    """
    # regexp strip, not F.trim: trim removes ASCII spaces only, while the
    # golden pandas kernel uses .str.strip() (all whitespace) — tab/newline
    # edge whitespace must produce the same variants in both paths
    t = F.regexp_replace(F.col("s.text"), r"^\s+|\s+$", "")
    header_shape = t.rlike(_HEADER_SHAPE_RE)
    all_caps = (
        t.rlike("[A-Za-z]") & ~t.rlike("[a-z]")
    )
    candidate = (
        (F.length(t) > 0)
        & (F.length(t) <= tn.MAX_RUNNING_HEADER_LEN)
        & (header_shape | all_caps)
        & ~t.startswith(tn.REPRINTED_PREFIX)
        & t.rlike("[A-Za-z]")
    )
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, rf"^{_PAGE_NUM_TOKEN}\s+", ""),
            rf"\s+{_PAGE_NUM_TOKEN}$",
            "",
        ),
        r"^\s+|\s+$",
        "",
    )
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "text") & candidate)
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.array(t, stripped))).alias("variant"),
        )
        .filter(F.length("variant") > 0)
        .dropDuplicates(["doc_id", "variant"])
    )


def heading_candidates_arrow(docs: DataFrame) -> DataFrame:
    """(doc_id, variant) candidates via the Arrow kernel (fast path).

    Same output contract as :func:`heading_candidates` (parity pinned by
    tests/test_arrow_kernel.py) but the per-span regex work runs as RE2
    passes inside mapInArrow — measured ~2× the JVM-regex pass-1
    throughput with better core scaling, and it shares the exact
    pandas-`str.strip` whitespace semantics of the golden kernel instead
    of re-deriving them in Java regex.
    """
    import pyarrow as pa

    from barks_ocr_spark.kernels import arrowspans

    def _gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield arrowspans.heading_candidates_batch(batch)

    # ship only the text strings across the Arrow boundary — pass 1
    # never reads kind/media_ref/offset bytes. Plain nested-field
    # extraction (spans.text), NOT filter+transform HOFs: the field path
    # is a codegen'd GetArrayStructFields while the HOF pair evaluates
    # interpreted lambdas per span (measured 1.99s → 1.60s for the
    # candidate scan at 32 cores on 2.4M docs, identical output — media
    # spans carry empty text, which the kernel's nonempty gate drops).
    return docs.select("doc_id", F.col("spans.text").alias("texts")).mapInArrow(
        _gen, "doc_id string, variant string"
    )


def repeating_headings_counted(docs: DataFrame, kernel: str = "arrow") -> DataFrame:
    """variants appearing on ≥3 distinct docs, with their distinct-doc
    counts (A7). Returns DataFrame[variant, n_docs]."""
    cand = (
        heading_candidates_arrow(docs)
        if kernel == "arrow"
        else heading_candidates(docs)
    )
    # The arrow kernel emits (doc_id, variant) pairs ALREADY distinct per
    # document (batch-local dedup + one row per doc per batch), so the
    # distinct-doc count is a plain count(*) — no distinct-expand, the
    # aggregate shuffles 33k partial counts instead of re-deduplicating
    # 3.8M pairs (measured 9.3s → 7.4s for the pass-1 aggregate at 32
    # cores on 2.4M docs). The relational path gives no such invariant
    # and keeps the exact countDistinct.
    n_docs = (
        F.count("*") if kernel == "arrow" else F.countDistinct("doc_id")
    )
    return (
        cand.groupBy("variant")
        .agg(n_docs.alias("n_docs"))
        .filter(F.col("n_docs") >= tn.RUNNING_HEADER_REPEAT_THRESHOLD)
    )


def repeating_headings(docs: DataFrame, kernel: str = "arrow") -> DataFrame:
    """variants appearing on ≥3 distinct docs (A7). Returns DataFrame[variant]."""
    return repeating_headings_counted(docs, kernel=kernel).select("variant")


# Driver-memory bound on the broadcast heading set. Genuine running
# headers number in the hundreds; 100k × ~80 chars ≈ 8 MB, far under any
# driver heap, while an adversarial corpus (every doc sharing millions
# of heading-shaped spans) can no longer OOM the driver.
DEFAULT_MAX_REPEATING_VARIANTS = 100_000


def repeating_heading_set(
    docs: DataFrame,
    kernel: str = "arrow",
    max_variants: int = DEFAULT_MAX_REPEATING_VARIANTS,
) -> frozenset[str]:
    """Pass-1 result as the driver-side broadcast set, with a BOUNDED
    collect: at most ``max_variants`` variants, chosen deterministically
    by (n_docs desc, variant asc) — the most-repeated headers are the
    real boilerplate, so truncation drops the least-load-bearing tail
    first and every run/partitioning keeps the identical set. The
    orderBy+limit plans as a distributed TakeOrdered, so the driver
    never holds more than the cap. Truncation is logged: silent caps
    read as full coverage when they aren't."""
    rows = (
        repeating_headings_counted(docs, kernel=kernel)
        .orderBy(F.desc("n_docs"), "variant")
        .limit(max_variants + 1)
        .collect()
    )
    if len(rows) > max_variants:
        import logging

        logging.getLogger(__name__).warning(
            "repeating-heading set truncated to %d variants "
            "(deterministic top by repeat count); corpus has more — "
            "raise max_variants if headers are being missed",
            max_variants,
        )
        rows = rows[:max_variants]
    return frozenset(r["variant"] for r in rows)


def inject_page_scans(docs: DataFrame, page_scans: DataFrame) -> DataFrame:
    """J9: prepend a synthetic full-page-scan media span at reading-order
    head for docs present in ``page_scans``
    (`books/src/llama-parse-build-epub.py:1080-1122`).

    ``page_scans`` is a small dim table → broadcast left join, no shuffle
    of the fat docs side.
    """
    scan = F.broadcast(page_scans.withColumnRenamed("media_ref", "_scan_ref"))
    joined = docs.join(scan, "doc_id", "left")
    scan_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.col("_scan_ref").alias("media_ref"),
        F.lit(-1).cast("int").alias("offset"),
    )
    return joined.withColumn(
        "spans",
        F.when(
            F.col("_scan_ref").isNotNull(),
            F.concat(F.array(scan_span), F.col("spans")),
        ).otherwise(F.col("spans")),
    ).drop("_scan_ref")


def extract(
    docs: DataFrame,
    page_scans: DataFrame | None = None,
    repeating: frozenset[str] | None = None,
    num_partitions: int | None = None,
    kernel: str = "arrow",
) -> DataFrame:
    """Full extraction: returns (doc_id, spans) with the output contract
    of kernels/spans.py (span-sequence equality key: kind, text,
    media_ref, order).

    ``kernel="arrow"`` (default) runs the pass-2 kernel via mapInArrow on
    raw RecordBatches (kernels/arrowspans.py): no Python-object span
    materialization, RE2 string passes on contiguous buffers — ~4×
    faster per core than the pandas kernel and far lighter on memory
    bandwidth, which is what multi-core scaling is bound by.
    ``kernel="pandas"`` keeps the golden pandas path (kernels/spans.py);
    byte-identical output is pinned by tests/test_arrow_kernel.py and
    the e2e golden tests.
    """
    spark = docs.sparkSession
    if repeating is None:
        # bounded deterministic collect — see repeating_heading_set
        repeating = repeating_heading_set(docs, kernel=kernel)
    bc = spark.sparkContext.broadcast(repeating)

    if page_scans is not None:
        docs = inject_page_scans(docs, page_scans)
    if num_partitions is not None:
        # spread skewed giant docs (single rows) evenly across tasks
        docs = docs.repartition(num_partitions, "doc_id")

    narrow = docs.select("doc_id", "spans")
    if kernel == "arrow":
        import pyarrow as pa

        from barks_ocr_spark.kernels import arrowspans

        def _gen_arrow(
            batches: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            rep = bc.value
            for batch in batches:
                yield arrowspans.extract_batch(batch, rep)

        return narrow.mapInArrow(_gen_arrow, DOCUMENTS_SPANS_SCHEMA)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rep = bc.value
        for batch in batches:
            yield span_kernel.extract_documents(batch, rep)

    return narrow.mapInPandas(_gen, DOCUMENTS_SPANS_SCHEMA)


def extraction_metrics(result: DataFrame) -> DataFrame:
    """Per-partition lineage metrics (A10/R6): pages processed, spans
    emitted, OCR-empty rate (docs with zero text spans)."""
    text_spans = F.size(F.filter("spans", lambda s: s["kind"] == F.lit("text")))
    return (
        result.select(
            F.spark_partition_id().alias("partition_id"),
            F.size("spans").alias("n_spans"),
            (text_spans == 0).cast("int").alias("is_empty"),
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("pages_processed"),
            F.sum("n_spans").alias("spans_emitted"),
            F.sum("is_empty").alias("docs_empty"),
            F.avg("is_empty").alias("ocr_empty_rate"),
        )
    )


def load_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read an interleaved-docs parquet/Iceberg table."""
    return spark.read.parquet(path)


def fold_footnote_items(items: DataFrame) -> DataFrame:
    """A8 footnote sessionization over a flat labeled-item table
    (doc_id, pos, text, is_footnote, ...): consecutive footnote items
    fold into their marker-started head item; everything else passes
    through (`books/src/llama-parse-build-epub.py:376-411`).

    Shuffle shape: one hash partition on doc_id (grouped-map needs whole
    documents); the fold itself is the vectorized layout kernel."""
    from barks_ocr_spark.kernels import layout

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        return layout.fold_footnotes(pdf)

    return items.groupBy("doc_id").applyInPandas(_fold, items.schema)
