"""I7 pixel segmentation, S13 filename-ordered JSON source, R2
skip-if-newer freshness."""

from __future__ import annotations

import json

import numpy as np

from barks_ocr_spark.kernels import geometry as geo


def test_segment_regions_grid():
    # white page, dark gutters → 2x2 panels; tall image so the y//200
    # row banding orders rows before columns
    img = np.full((900, 700), 255.0)
    img[:4, :] = 0
    img[-4:, :] = 0
    img[:, :4] = 0
    img[:, -4:] = 0
    img[440:460, :] = 0  # horizontal gutter
    img[:, 340:360] = 0  # vertical gutter
    boxes = geo.segment_regions(img)
    assert boxes.shape == (4, 4)
    # reading order: top-left, top-right, bottom-left, bottom-right
    xs, ys = boxes[:, 0], boxes[:, 1]
    assert ys[0] == ys[1] < ys[2] == ys[3]
    assert xs[0] < xs[1] and xs[2] < xs[3]


def test_segment_regions_containment_filter():
    # a bright frame region enclosing a bright inner region: the outer
    # (containing) region must be dropped, innermost wins
    img = np.zeros((100, 100))
    img[5:95, 5:95] = 255.0  # outer bright block
    img[40:60, 40:60] = 0.0  # dark ring...
    img[45:55, 45:55] = 255.0  # ...with a bright inner island
    boxes = geo.segment_regions(img)
    assert len(boxes) == 1
    x, y, w, h = boxes[0]
    assert (x, y, w, h) == (45, 45, 10, 10)


def test_json_pages_filename_order(spark, tmp_path):
    from barks_ocr_spark.sources.jsonsource import read_json_pages

    d = tmp_path / "pages"
    d.mkdir()
    # write out of order on purpose — name sort, not mtime, wins
    for stem, val in [("page_003", "c"), ("page_001", "a"), ("page_002", "b")]:
        (d / f"{stem}.json").write_text(json.dumps({"value": val}))
    out = read_json_pages(spark, str(d / "*.json")).orderBy("file_order").collect()
    assert [r["doc_id"] for r in out] == ["page_001", "page_002", "page_003"]
    assert [r["file_order"] for r in out] == [0, 1, 2]
    assert [r["value"] for r in out] == ["a", "b", "c"]


def test_skip_if_newer_reprocesses_updated_docs(spark, tmp_path):
    import pandas as pd

    from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA
    from barks_ocr_spark.sources.checkpoint import ExtractionJob

    def docs_at(version_by_doc):
        rows = []
        for i, v in version_by_doc.items():
            rows.append(
                {
                    "doc_id": f"doc{i}",
                    "spans": [
                        {
                            "kind": "text",
                            "text": f"content v{v} of doc {i}.",
                            "media_ref": "",
                            "offset": 0,
                        }
                    ],
                }
            )
        df = spark.createDataFrame(pd.DataFrame(rows), schema=DOCUMENTS_SPANS_SCHEMA)
        vmap = {f"doc{i}": v for i, v in version_by_doc.items()}
        from pyspark.sql import functions as F

        expr = F.lit(None).cast("long")
        for k, v in vmap.items():
            expr = F.when(F.col("doc_id") == k, F.lit(v)).otherwise(expr)
        return df.withColumn("version", expr.cast("long"))

    job = ExtractionJob(str(tmp_path / "res"), str(tmp_path / "ckpt"))
    r1 = job.run(spark, docs_at({0: 1, 1: 1, 2: 1}), version_col="version")
    assert r1["docs"] == 3

    # doc1 updated to version 2 → only it re-processes (R2)
    r2 = job.run(spark, docs_at({0: 1, 1: 2, 2: 1}), version_col="version")
    assert r2["docs"] == 1

    latest = job.read_results_latest(spark, "version")
    rows = {r["doc_id"]: r for r in latest.collect()}
    assert len(rows) == 3
    assert rows["doc1"]["version"] == 2
    assert "V2" in rows["doc1"]["spans"][0]["text"]
    assert rows["doc0"]["version"] == 1
