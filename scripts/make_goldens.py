"""Generate golden parquet fixtures for the binary-kernel registry
queries (comic_spans, media_features), whose semantics aren't
SQL-expressible: the goldens are the pure-pandas kernel outputs over the
exact seeded inputs the registry queries use, written once and committed.
The DuckDB oracle then reads them via read_parquet() — the differential
check covers the whole Spark side (mapInPandas plumbing, Arrow transfer,
schemas, partitioning) against the kernel-direct path.

Run from the repo root: python scripts/make_goldens.py
Regenerate whenever datagen seeds or kernel semantics change.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from barks_ocr_spark.datagen import docs as dg  # noqa: E402
from barks_ocr_spark.kernels import fakeocr, grouping  # noqa: E402
from barks_ocr_spark.operators import media  # noqa: E402

GOLDENS = Path(__file__).resolve().parent.parent / "goldens"


def comic_spans_golden() -> pa.Table:
    """Mirror q_comic_spans: gen_pages_geom(100, seed=11) → decode blob →
    group → spans → exploded rows, all through the pandas kernels."""
    pages = dg.gen_pages_geom(100, seed=11)
    decoded = []
    for _, row in pages.iterrows():
        page = fakeocr.decode_page(bytes(row["page_image"]))
        decoded.append(
            {
                "doc_id": row["doc_id"],
                "panels": [
                    {"x": x, "y": y, "w": w, "h": h} for x, y, w, h in page["panels"]
                ],
                "boxes": page["boxes"],
            }
        )
    groups = grouping.pages_to_groups(pd.DataFrame(decoded))
    spans = grouping.groups_to_spans(groups)
    rows = []
    for _, r in spans.iterrows():
        for s in r["spans"]:
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
            )
    pdf = pd.DataFrame(rows)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "kind": pa.array(pdf["kind"], pa.string()),
            "text": pa.array(pdf["text"], pa.string()),
            "media_ref": pa.array(pdf["media_ref"], pa.string()),
            "offset": pa.array(pdf["offset"], pa.int32()),
        }
    )


def media_features_golden() -> pa.Table:
    """Mirror q_media_features: 200 seeded fake images → byte-histogram
    features → exploded (doc_id, media_ref, dim, v) rows."""
    n_features = 8
    out = {"doc_id": [], "media_ref": [], "dim": [], "v": []}
    for i in range(200):
        blob = media.encode_fake_image(64 + i, 32 + i, 3, seed=i)
        _, _, _, payload = media._decode_image(blob)
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        if arr.size == 0:
            feats = np.zeros(n_features)
        else:
            hist, _ = np.histogram(arr, bins=n_features, range=(0, 256))
            feats = hist / arr.size
        for d, v in enumerate(feats.astype(np.float32)):
            out["doc_id"].append(f"m{i}")
            out["media_ref"].append(f"img{i}.png")
            out["dim"].append(d)
            out["v"].append(v)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "dim": pa.array(out["dim"], pa.int32()),
            "v": pa.array(out["v"], pa.float32()),
        }
    )


def main() -> None:
    GOLDENS.mkdir(exist_ok=True)
    t1 = comic_spans_golden()
    pq.write_table(t1, GOLDENS / "comic_spans.parquet")
    t2 = media_features_golden()
    pq.write_table(t2, GOLDENS / "media_features.parquet")
    print(f"comic_spans: {t1.num_rows} rows, media_features: {t2.num_rows} rows")


if __name__ == "__main__":
    main()
