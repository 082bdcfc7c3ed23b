"""Deterministic page-image codec + OCR kernel stub.

On a real cluster the OCR stage is a batched model kernel inside an
iterator pandas UDF (the reference runs EasyOCR/PaddleOCR in-process with
batch_size 16, `src/barks_ocr/pipeline/batch_ocr.py:182-275`; the Spark
analogue loads the model once per executor and consumes Arrow batches).
This sandbox has no OCR libraries, so the *model* is replaced by a
deterministic codec: page images are opaque ``binary`` blobs that encode
the page's panel + box layout, and "OCR" decodes them back. The Spark-side
plumbing — BinaryType column, Arrow batch transfer, UDF signature, box
schema — is identical to the real path; only ``_infer`` differs.

Blob layout (little-endian):
  magic b"BOCR1" | u16 page_w | u16 page_h
  | u16 n_panels | n_panels × (4 × u16: x y w h)
  | u16 n_boxes  | per box: 8 × u16 quad | f32 prob | u16 len | utf-8 text
"""

from __future__ import annotations

import struct

MAGIC = b"BOCR1"


def encode_page(
    page_w: int,
    page_h: int,
    panels: list[tuple[int, int, int, int]],
    boxes: list[tuple[list[int], str, float]],
) -> bytes:
    """Pack a synthetic page layout into the image-blob format."""
    parts = [MAGIC, struct.pack("<HH", page_w, page_h), struct.pack("<H", len(panels))]
    for x, y, w, h in panels:
        parts.append(struct.pack("<4H", x, y, w, h))
    parts.append(struct.pack("<H", len(boxes)))
    for quad, text, prob in boxes:
        raw = text.encode("utf-8")
        parts.append(struct.pack("<8h", *quad))
        parts.append(struct.pack("<fH", prob, len(raw)))
        parts.append(raw)
    return b"".join(parts)


# ── I8: rotation-sweep OCR ───────────────────────────────────────────────
# The reference re-OCRs sound-effect crops at each axis-aligned rotation
# and keeps the best dash-normalized fuzzy score vs the cleaned text
# (`src/barks_ocr/tools/florence_check.py:62-77, 250-288`).
SFX_ROTATIONS = (0, 90, 180, 270)

_DASH_RUN = "—–−-"


def _dash_canon(s: str) -> str:
    import re

    return re.sub(f"[{_DASH_RUN}]+", "-", s)


def rotation_score(candidate: str, target: str) -> float:
    """Similarity used by the sweep: dash runs canonicalized on BOTH
    sides before scoring (florence_check.py:74-77, 306-316), difflib
    standing in for thefuzz (same [0,1] contract)."""
    from difflib import SequenceMatcher

    return SequenceMatcher(None, _dash_canon(candidate), _dash_canon(target)).ratio()


def pick_best_rotation(
    candidates: list[tuple[int, str]], target: str
) -> tuple[int, float]:
    """I8 selection: (rotation, score) of the best-scoring rotation's OCR
    text; ties keep the earliest rotation in sweep order (the reference
    iterates 0→90→180→270 and replaces only on strict improvement)."""
    best_rot, best_score = candidates[0][0], -1.0
    for rot, text in candidates:
        score = rotation_score(text, target)
        if score > best_score:
            best_rot, best_score = rot, score
    return best_rot, best_score


def rotate_text_stub(text: str, rot: int, true_rot: int = 0) -> str:
    """STUB for 'OCR of a crop rotated by ``rot``': correct text only
    when the crop is rotated back to its true orientation; other
    rotations yield deterministic garble (reversed / shifted) — the
    shape a real engine produces on sideways text."""
    if rot % 360 == true_rot % 360:
        return text
    if (rot - true_rot) % 360 == 180:
        return text[::-1]
    return "".join(c if c == " " else chr(((ord(c) - 97 + 7) % 26) + 97) if c.islower() else c for c in text)


def decode_page(blob: bytes) -> dict:
    """Unpack an image blob → {page_w, page_h, panels, boxes}.

    This stands in for model inference; swap for a real engine by
    replacing this function only (clearly-marked stub boundary).
    """
    if blob[:5] != MAGIC:
        msg = "not a BOCR1 page image"
        raise ValueError(msg)
    off = 5
    page_w, page_h = struct.unpack_from("<HH", blob, off)
    off += 4
    (n_panels,) = struct.unpack_from("<H", blob, off)
    off += 2
    panels = []
    for _ in range(n_panels):
        panels.append(struct.unpack_from("<4H", blob, off))
        off += 8
    (n_boxes,) = struct.unpack_from("<H", blob, off)
    off += 2
    boxes = []
    for _ in range(n_boxes):
        quad = list(struct.unpack_from("<8h", blob, off))
        off += 16
        prob, tlen = struct.unpack_from("<fH", blob, off)
        off += 6
        text = blob[off : off + tlen].decode("utf-8")
        off += tlen
        boxes.append({"box": quad, "ocr_text": text, "prob": float(prob)})
    return {"page_w": page_w, "page_h": page_h, "panels": panels, "boxes": boxes}
