"""Comic-page pipeline: page-image bytes → OCR boxes → groups → spans.

The Spark shape of the reference's `barks-ocr-batch` +
`barks-ocr-gemini-*` chain (SURVEY.md §3.1-3.2), collapsed into one
narrow job:

  pages(doc_id, page_image:binary)
    → mapInPandas [decode/OCR kernel, batched]        (I1-I3 stand-in)
    → mapInPandas [grouping kernel: F1-F4, J1-J3, A1-A2, W1]
    → (doc_id, groups) and/or (doc_id, spans)

Both stages are Arrow-batched and shuffle-free: each page is one row and
all geometry is intra-row. On a real cluster the decode stage swaps the
fake codec for a model kernel (iterator UDF, model loaded once per
executor — the Spark analogue of `pipeline/batch_ocr.py:185`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from barks_ocr_spark.kernels import fakeocr, grouping
from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA, PAGE_GROUPS_SCHEMA

_DECODED_SCHEMA = (
    "doc_id string, panels array<struct<x:int,y:int,w:int,h:int>>, "
    "boxes array<struct<box:array<int>, ocr_text:string, prob:double>>"
)


def ocr_pages(pages: DataFrame) -> DataFrame:
    """Decode page images into panels + raw OCR boxes (batched kernel).

    STUB BOUNDARY: `fakeocr.decode_page` stands in for model inference;
    the UDF signature (binary in, box structs out) is the production one.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model-load-once-per-executor would happen here (iterator UDF)
        for batch in batches:
            out_doc, out_panels, out_boxes = [], [], []
            for doc_id, blob in zip(batch["doc_id"], batch["page_image"]):
                page = fakeocr.decode_page(bytes(blob))
                out_doc.append(doc_id)
                out_panels.append(
                    [{"x": x, "y": y, "w": w, "h": h} for x, y, w, h in page["panels"]]
                )
                out_boxes.append(page["boxes"])
            yield pd.DataFrame(
                {"doc_id": out_doc, "panels": out_panels, "boxes": out_boxes}
            )

    return pages.select("doc_id", "page_image").mapInPandas(_gen, _DECODED_SCHEMA)


def group_pages(decoded: DataFrame, cluster_gap: int = 12) -> DataFrame:
    """Grouping kernel: (doc_id, panels, boxes) → (doc_id, groups)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield grouping.pages_to_groups(batch, cluster_gap=cluster_gap)

    return decoded.mapInPandas(_gen, PAGE_GROUPS_SCHEMA)


def groups_to_spans(page_groups: DataFrame) -> DataFrame:
    """Span emission: ordered group texts → (doc_id, spans)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield grouping.groups_to_spans(batch)

    return page_groups.mapInPandas(_gen, DOCUMENTS_SPANS_SCHEMA)


def comic_pipeline(pages: DataFrame, cluster_gap: int = 12) -> DataFrame:
    """pages(doc_id, page_image) → (doc_id, spans), end to end."""
    return groups_to_spans(group_pages(ocr_pages(pages), cluster_gap=cluster_gap))
