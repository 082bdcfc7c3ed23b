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


def rescale_boxes(
    decoded: DataFrame,
    x_scale: float = 1.0,
    y_scale: float = 1.0,
    xlat: int = 0,
    ylat: int = 0,
    rect_scale: float = 1.1,
) -> DataFrame:
    """I9 drifted-box affine fix, all intra-row column arithmetic.

    Per corner: ``round(scale * (translate + coord))``; then the quad is
    re-derived axis-aligned from a center-scale of the TL/BR corners
    (`src/barks_ocr/tools/quick_fix.py:7-41, 92-112`). Python's round()
    is half-even → ``bround``, not ``round``.
    """
    from pyspark.sql import functions as F

    def _sx(e):
        return F.bround(F.lit(float(x_scale)) * (F.lit(int(xlat)) + e))

    def _sy(e):
        return F.bround(F.lit(float(y_scale)) * (F.lit(int(ylat)) + e))

    def _fix_quad(box):
        x0, y0 = _sx(box[0]), _sy(box[1])
        x1, y1 = _sx(box[4]), _sy(box[5])  # corner 2 = bottom-right
        w, h = x1 - x0, y1 - y0
        cx, cy = x0 + w / 2, y0 + h / 2
        nw, nh = w * F.lit(float(rect_scale)), h * F.lit(float(rect_scale))
        nx0 = F.bround(cx - nw / 2).cast("int")
        ny0 = F.bround(cy - nh / 2).cast("int")
        nx1 = F.bround(cx + nw / 2).cast("int")
        ny1 = F.bround(cy + nh / 2).cast("int")
        return F.array(nx0, ny0, nx1, ny0, nx1, ny1, nx0, ny1)

    fixed = F.transform(
        "boxes",
        lambda b: F.struct(
            _fix_quad(b["box"]).alias("box"),
            b["ocr_text"].alias("ocr_text"),
            b["prob"].alias("prob"),
        ),
    )
    return decoded.withColumn("boxes", fixed)


def comic_pipeline(pages: DataFrame, cluster_gap: int = 12) -> DataFrame:
    """pages(doc_id, page_image) → (doc_id, spans), end to end."""
    return groups_to_spans(group_pages(ocr_pages(pages), cluster_gap=cluster_gap))


def filter_comic_titles(pages: DataFrame, catalog: DataFrame) -> DataFrame:
    """F6: keep only pages whose title is a comic in the catalog dim
    (`src/barks_ocr/pipeline/batch_ocr.py:51-53`'s exclude_non_comics).

    ``catalog``: (title, is_comic). Broadcast left-semi join — the
    catalog is human-curated and tiny, the pages table never shuffles.
    """
    from pyspark.sql import functions as F

    comics = F.broadcast(catalog.filter(F.col("is_comic")).select("title"))
    return pages.join(comics, "title", "left_semi")


def promotion_violations(prelim: DataFrame) -> DataFrame:
    """Docs where MORE than one engine is flagged use_as_final — the
    invariant the reference asserts per page
    (`src/barks_ocr/pipeline/final_groups.py:39`:
    ``assert (not g1) or (not g2)``). Must be empty before promotion."""
    from pyspark.sql import functions as F

    return (
        prelim.filter(F.col("use_as_final"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_flagged"))
        .filter(F.col("n_flagged") > 1)
    )


def promote_final_groups(prelim: DataFrame, strict: bool = True) -> DataFrame:
    """S6: promote exactly one engine's prelim groups per page to final.

    ``prelim``: (doc_id, engine, use_as_final, groups). Per the
    reference (`src/barks_ocr/pipeline/final_groups.py:37-47`): the
    flagged engine's groups become final; pages with no flagged engine
    are 'not ready' and excluded; two flagged engines violate the
    asserted invariant (checked eagerly when ``strict`` — the Spark
    analogue of the reference's per-file assert)."""
    if strict:
        bad = promotion_violations(prelim).limit(1).collect()
        if bad:
            msg = f"doc {bad[0]['doc_id']}: multiple engines flagged use_as_final"
            raise AssertionError(msg)
    from pyspark.sql import functions as F

    return prelim.filter(F.col("use_as_final")).select("doc_id", "engine", "groups")
