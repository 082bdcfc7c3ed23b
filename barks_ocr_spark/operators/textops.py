"""Spark operators for the per-string text kernels and layout kernels.

Exposes the previously pytest-only kernels as DataFrame transforms so
each SURVEY §2 item has a registry query with a DuckDB oracle:

  F4   spell-suggest           kernels/textnorm.spell_suggest
       (reference `src/barks_ocr/pipeline/batch_ocr.py:163-179`)
  T7   comparison key          kernels/textnorm.comparison_key
       (`src/barks_ocr/tools/florence_check.py:74-77, 306-316`)
  T8   sentence-end detection  kernels/textnorm.has_dot_at_end_of_sentence
       (`src/barks_ocr/utils/group_checks.py:23-57, 75-81`)
  T11  line-pattern rewrap     kernels/layout.rewrap_to_pattern
       (`src/barks_ocr/tools/ocr_check.py:156-182`)
  T12  text-fit estimation     kernels/layout.text_fits_box
       (`src/barks_ocr/tools/ocr_check.py:33-38, 75-153`)
  W3   column split by x-jump  kernels/layout.split_columns
       (`books/src/llama-parse-build-epub.py:279-360`)
  W4   blockquote indent       kernels/layout.blockquote_flags
       (`books/src/llama-parse-build-epub.py:481-512`)

All Arrow-batched (mapInPandas for the per-string kernels — shuffle-free
scans — and applyInPandas per doc_id for the stateful layout scans); no
per-row Python UDFs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _map_kernel(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
) -> DataFrame:
    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield fn(batch)

    return df.mapInPandas(_gen, out_schema)


def spell_suggest(
    docs: DataFrame, dictionary: tuple[str, ...], text_col: str = "text"
) -> DataFrame:
    """F4: per-word spell pass — in-dictionary words unchanged, unknown
    words replaced by the closest dictionary suggestion (broadcast by
    closure; only unknown words pay the suggestion cost)."""
    d = frozenset(dictionary)

    from barks_ocr_spark.kernels import textnorm as tn

    def k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "fixed": tn.spell_suggest(b[text_col], d)}
        )

    return _map_kernel(
        docs.select("doc_id", text_col), k, "doc_id long, fixed string"
    )


def comparison_keys(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T7/T6: matching-only normalization (dash-run fold, whitespace
    strip, lowercase) — never applied to stored text."""
    from barks_ocr_spark.kernels import textnorm as tn

    def k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "ckey": tn.comparison_key(b[text_col])}
        )

    return _map_kernel(docs.select("doc_id", text_col), k, "doc_id long, ckey string")


def sentence_end_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T8: abbreviation-aware sentence-final-dot detector."""
    from barks_ocr_spark.kernels import textnorm as tn

    def k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "fired": tn.has_dot_at_end_of_sentence(b[text_col]),
            }
        )

    return _map_kernel(
        docs.select("doc_id", text_col), k, "doc_id long, fired boolean"
    )


def rewrap(docs: DataFrame, pattern: str, text_col: str = "text") -> DataFrame:
    """T11: re-wrap each text to the word counts of ``pattern``'s lines."""
    from barks_ocr_spark.kernels import layout

    def k(b: pd.DataFrame) -> pd.DataFrame:
        pats = pd.Series([pattern] * len(b), index=b.index)
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "wrapped": layout.rewrap_series(b[text_col], pats)}
        )

    return _map_kernel(
        docs.select("doc_id", text_col), k, "doc_id long, wrapped string"
    )


def text_fits(boxes: DataFrame, text_col: str = "text") -> DataFrame:
    """T12: (doc_id, text, box_w, box_h) → + fits, deterministic font
    metrics (kernels/layout constants)."""
    from barks_ocr_spark.kernels import layout

    def k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "box_w": b["box_w"],
                "box_h": b["box_h"],
                "fits": layout.fits_series(b[text_col], b["box_w"], b["box_h"]),
            }
        )

    return _map_kernel(
        boxes.select("doc_id", text_col, "box_w", "box_h"),
        k,
        "doc_id long, box_w int, box_h int, fits boolean",
    )


def rect_distances(rects: DataFrame) -> DataFrame:
    """I5: min distance between two axis-aligned rects per row (0 when
    overlapping). ``rects`` = (doc_id, ax0, ay0, ax1, ay1, bx0, by0,
    bx1, by1); numpy kernel (kernels/geometry.rect_distance), the
    reference's edge-geometry construction reduced to closed form."""
    import numpy as np

    from barks_ocr_spark.kernels import geometry as geo

    def k(b: pd.DataFrame) -> pd.DataFrame:
        a = np.stack([b["ax0"], b["ay0"], b["ax1"], b["ay1"]], axis=1)
        bb = np.stack([b["bx0"], b["by0"], b["bx1"], b["by1"]], axis=1)
        return pd.DataFrame({"doc_id": b["doc_id"], "dist": geo.rect_distance(a, bb)})

    return _map_kernel(
        rects.select("doc_id", "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"),
        k,
        "doc_id long, dist double",
    )


def split_columns(items: DataFrame, page_width: float) -> DataFrame:
    """W3: per-doc column labels from consecutive x-jumps. ``items`` =
    (doc_id, pos, x) in reading order; one hash partition on doc_id (the
    scan is stateful per document), kernel vectorized inside."""
    from barks_ocr_spark.kernels import layout

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos", ignore_index=True)
        pdf["col"] = layout.split_columns(pdf["x"].to_numpy(), page_width)
        return pdf

    return items.groupBy("doc_id").applyInPandas(
        f, "doc_id long, pos int, x double, col long"
    )


def blockquotes(items: DataFrame, page_width: float) -> DataFrame:
    """W4 (on top of W3): items indented ≥15pt beyond their column's
    median left-x."""
    from barks_ocr_spark.kernels import layout

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos", ignore_index=True)
        cols = layout.split_columns(pdf["x"].to_numpy(), page_width)
        pdf["col"] = cols
        pdf["is_bq"] = layout.blockquote_flags(pdf["x"].to_numpy(), cols)
        return pdf

    return items.groupBy("doc_id").applyInPandas(
        f, "doc_id long, pos int, x double, col long, is_bq boolean"
    )
