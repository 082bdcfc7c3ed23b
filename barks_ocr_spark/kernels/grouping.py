"""Comic-page box→group→span kernel (the geometric half of the engine).

Reproduces the reference's grouping stage semantics
(`src/barks_ocr/pipeline/gemini_grouper.py`) with the LLM replaced by a
deterministic spatial clusterer (contract from the prompt,
`src/barks_ocr/utils/gemini_ai_comic_prompts.py:90-106`: one group per
bubble, never across panels):

  F1  confidence filter: drop prob < 0.1 or empty text
      (`src/barks_ocr/pipeline/batch_ocr.py:203-204`)
  F2-F4/T1/T2  spell filter + auto-correct + uppercase
      (`src/barks_ocr/pipeline/batch_ocr.py:125-179`)
  J1  box→group clustering (padded-bbox union-find)
  A1  enclosing box per group (`gemini_grouper.py:281-288`)
  J2/J3  panel containment with 20/40/60 shrink retry
      (`gemini_grouper.py:290-312`, `tools/ocr_check.py:471-506`)
  A2  per-group text concat in (y, x) member order, uppercased
      (`gemini_grouper.py:314-337`)
  W1  reading-order renumber: (panel_num, y0, x0), -1 last
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from barks_ocr_spark.kernels import geometry as geo
from barks_ocr_spark.kernels import textnorm as tn

MIN_PROB = 0.1


def accept_texts(ocr_texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Spell-filter stage: returns (keep_mask, accepted_text).

    Mirrors `words_are_ok` (`src/barks_ocr/pipeline/batch_ocr.py:125-141`):
    auto-correct the whole string first; else accept word-by-word,
    rejecting the box if any word is in REJECTED_WORDS; accepted words are
    uppercased/stripped.
    """
    t = ocr_texts.fillna("").str.strip()
    corrected = tn.auto_correct(t)
    upper = tn.barks_upper(corrected)
    keep = ~tn.has_rejected_token(upper) & (upper.str.len() > 0)
    return keep, upper


def page_groups(
    panels_xywh: np.ndarray, boxes: list[dict], cluster_gap: int = 12
) -> list[dict]:
    """All groups for one page, in reading order. Each box dict carries
    ``box`` (8-int quad), ``ocr_text``, ``prob``."""
    if not boxes:
        return []
    df = pd.DataFrame(boxes)
    df = df[(df["prob"] >= MIN_PROB) & (df["ocr_text"].fillna("").str.strip() != "")]
    if len(df) == 0:
        return []
    keep, accepted = accept_texts(df["ocr_text"])
    df = df[keep].assign(accepted_text=accepted[keep])
    if len(df) == 0:
        return []

    quads = np.stack([np.asarray(q, dtype=np.int64) for q in df["box"]])
    bb = geo.axis_bbox(quads)
    labels = geo.cluster_boxes(bb, gap=cluster_gap)

    groups = []
    for g in np.unique(labels):
        member = labels == g
        mb = bb[member]
        enc = geo.enclosing_box(mb)
        # member order inside the bubble: top-to-bottom, left-to-right
        order = np.lexsort((mb[:, 0], mb[:, 1]))
        texts = df["accepted_text"].to_numpy()[member][order]
        groups.append(
            {
                "x0": int(enc[0]),
                "y0": int(enc[1]),
                "x1": int(enc[2]),
                "y1": int(enc[3]),
                "text": " ".join(texts),
            }
        )
    enc_boxes = np.array([[g["x0"], g["y0"], g["x1"], g["y1"]] for g in groups])
    panel_nums = geo.assign_panels(enc_boxes, panels_xywh)
    ranks = geo.reading_order(
        panel_nums, enc_boxes[:, 1], enc_boxes[:, 0]
    )
    for g, pn, r in zip(groups, panel_nums, ranks):
        g["panel_num"] = int(pn)
        g["group_id"] = int(r)
    groups.sort(key=lambda g: g["group_id"])
    return groups


def pages_to_groups(batch: pd.DataFrame, cluster_gap: int = 12) -> pd.DataFrame:
    """Batch kernel: (doc_id, panels, boxes) → (doc_id, groups).

    ``panels`` arrives as a list of {x,y,w,h} dicts, ``boxes`` as a list
    of box dicts (either from the parquet column or from the OCR decode).
    """
    out_docs, out_groups = [], []
    for doc_id, panels, boxes in zip(batch["doc_id"], batch["panels"], batch["boxes"]):
        p = (
            np.array([[pp["x"], pp["y"], pp["w"], pp["h"]] for pp in panels], dtype=np.int64)
            if len(panels)
            else np.zeros((0, 4), dtype=np.int64)
        )
        box_dicts = [
            {"box": list(b["box"]), "ocr_text": b["ocr_text"], "prob": float(b["prob"])}
            for b in boxes
        ]
        groups = page_groups(p, box_dicts, cluster_gap=cluster_gap)
        out_docs.append(doc_id)
        out_groups.append(
            [
                {
                    "group_id": g["group_id"],
                    "panel_num": g["panel_num"],
                    "x0": g["x0"],
                    "y0": g["y0"],
                    "x1": g["x1"],
                    "y1": g["y1"],
                    "text": g["text"],
                }
                for g in groups
            ]
        )
    return pd.DataFrame({"doc_id": out_docs, "groups": out_groups})


def groups_to_spans(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, groups) → (doc_id, spans): group text in reading order,
    offsets 0..n-1 — the comic pipeline's span emission."""
    out_docs, out_spans = [], []
    for doc_id, groups in zip(batch["doc_id"], batch["groups"]):
        spans = [
            {"kind": "text", "text": g["text"], "media_ref": "", "offset": i}
            for i, g in enumerate(sorted(groups, key=lambda g: g["group_id"]))
        ]
        out_docs.append(doc_id)
        out_spans.append(spans)
    return pd.DataFrame({"doc_id": out_docs, "spans": out_spans})
