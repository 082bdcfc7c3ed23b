"""Comic-page pipeline: binary page image → OCR decode → groups → spans."""

from __future__ import annotations

import numpy as np

from barks_ocr_spark.datagen import docs as dg
from barks_ocr_spark.kernels import fakeocr, geometry as geo, grouping as gk
from barks_ocr_spark.operators import comic
from barks_ocr_spark.schemas import PAGES_GEOM_SCHEMA


def test_codec_roundtrip():
    panels = [(40, 40, 960, 980)]
    boxes = [([10, 58, 210, 58, 210, 10, 10, 10], "hello there", 0.91)]
    page = fakeocr.decode_page(fakeocr.encode_page(2000, 3000, panels, boxes))
    assert page["page_w"] == 2000
    assert list(page["panels"][0]) == [40, 40, 960, 980]
    assert page["boxes"][0]["ocr_text"] == "hello there"
    assert abs(page["boxes"][0]["prob"] - 0.91) < 1e-6


def test_assign_panels_shrink_retry():
    panels = np.array([[100, 100, 500, 500]])
    inside = [150, 150, 300, 200]          # direct containment
    straddle15 = [85, 300, 300, 460]       # 15px overhang → shrink 20 fixes
    straddle55 = [45, 300, 300, 500]       # 55px overhang → shrink 60 fixes
    gutter = [0, 0, 50, 50]                # never inside
    out = geo.assign_panels(np.array([inside, straddle15, straddle55, gutter]), panels)
    assert out.tolist() == [1, 1, 1, -1]


def test_reading_order_row_major():
    # panels 1..4; -1 sorts last; within panel by (y, x)
    pn = np.array([2, 1, 1, -1, 3])
    y0 = np.array([10, 50, 10, 0, 5])
    x0 = np.array([0, 0, 900, 0, 0])
    ranks = geo.reading_order(pn, y0, x0)
    # panel1:(10,900)=0? no: panel1 rows → (1,10,900) rank 1? ordering:
    # (1,10,900)→0, (1,50,0)→1, (2,10,0)→2, (3,5,0)→3, (-1,..)→4
    assert ranks.tolist() == [2, 1, 0, 4, 3]


def test_cluster_boxes_stacked_lines():
    # three stacked lines 56px apart cluster together; a far box does not
    b = np.array(
        [[0, 0, 200, 48], [0, 56, 200, 104], [0, 112, 200, 160], [1000, 1000, 1100, 1040]]
    )
    labels = geo.cluster_boxes(b, gap=12)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]


def test_comic_pipeline_spark_matches_pandas(spark):
    pages_pdf = dg.gen_pages_geom(30, seed=11)
    golden_groups = gk.pages_to_groups(pages_pdf)
    golden_spans = gk.groups_to_spans(golden_groups)

    pages = spark.createDataFrame(pages_pdf, schema=PAGES_GEOM_SCHEMA).repartition(4)
    result = comic.comic_pipeline(pages)
    got = {r["doc_id"]: r["spans"] for r in result.collect()}

    assert len(got) == 30
    for _, row in golden_spans.iterrows():
        g = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[row.doc_id]]
        e = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row.spans]
        assert g == e, f"span mismatch for {row.doc_id}"
    # invariants: reading order is 0..n-1; no rejected/low-prob text leaked
    for spans in got.values():
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        for s in spans:
            assert "GHOST" not in s["text"]
            assert s["text"] != "OO"


def test_rescale_boxes_matches_reference_math(spark):
    # Independent oracle: the quick_fix.py formulas (I9) in plain Python —
    # per-corner round(scale*(xlat+coord)) with Python half-even rounding,
    # then a center-scale of the TL/BR rect, re-emitted axis-aligned.
    def oracle(quad, x_scale, y_scale, xlat, ylat, rect_scale):
        pts = [
            (round(x_scale * (xlat + quad[2 * i])), round(y_scale * (ylat + quad[2 * i + 1])))
            for i in range(4)
        ]
        (x0, y0), (x1, y1) = pts[0], pts[2]
        w, h = x1 - x0, y1 - y0
        cx, cy = x0 + w / 2, y0 + h / 2
        nw, nh = w * rect_scale, h * rect_scale
        nx0, ny0 = round(cx - nw / 2), round(cy - nh / 2)
        nx1, ny1 = round(cx + nw / 2), round(cy + nh / 2)
        return [nx0, ny0, nx1, ny0, nx1, ny1, nx0, ny1]

    params = {"x_scale": 0.928, "y_scale": 1.026, "xlat": 130, "ylat": -25}
    quads = [
        [100, 200, 300, 200, 300, 260, 100, 260],
        [1, 1, 9, 1, 9, 5, 1, 5],        # odd coords → .5 products hit bround
        [0, 0, 10, 0, 10, 10, 0, 10],
    ]
    rows = [("p1", [], [{"box": q, "ocr_text": "T", "prob": 0.9} for q in quads])]
    df = spark.createDataFrame(
        rows,
        "doc_id string, panels array<struct<x:int,y:int,w:int,h:int>>, "
        "boxes array<struct<box:array<int>, ocr_text:string, prob:double>>",
    )
    out = comic.rescale_boxes(df, **params, rect_scale=1.1).collect()[0]["boxes"]
    got = [list(b["box"]) for b in out]
    want = [oracle(q, rect_scale=1.1, **params) for q in quads]
    assert got == want
    assert all(b["ocr_text"] == "T" and b["prob"] == 0.9 for b in out)


def test_padded_clipped_bbox():
    quads = np.array(
        [
            [10, 10, 50, 10, 50, 30, 10, 30],   # interior box
            [2, 2, 8, 2, 8, 6, 2, 6],           # clips at origin
            [90, 60, 99, 60, 99, 68, 90, 68],   # clips at image edge
        ]
    )
    out = geo.padded_clipped_bbox(quads, pad=5, image_w=100, image_h=70)
    assert out.tolist() == [
        [5, 5, 55, 35],
        [0, 0, 13, 11],
        [85, 55, 100, 70],
    ]
