"""Seeded generator for the interleaved text+media documents table
(FIXTURES.md §1) and the comic-page geometric table (§2).

Every noise feature planted here exercises a specific kernel; the golden
expected outputs come from the pure-pandas pipeline in kernels/ (single
source of truth), with hand-written micro-fixtures in tests/ guarding the
kernels themselves. No wall clock, no global RNG — same seed, same bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from barks_ocr_spark.kernels import fakeocr

# Vocabulary is chosen to avoid accidental collisions with the rejected-
# fragment list and page-number shapes.
_VOCAB = (
    "the duck found a nugget near town square and nobody believed him "
    "uncle scrooge counted every coin in his money bin that night while "
    "donald paddled across the bay chasing gulls with great determination "
    "gladstone never worked yet always won which made everyone furious "
    "gyro built another machine that sorted pennies faster than thought"
).split()

_HEADERS = [
    "xvi INTRODUCTION",
    "INTRODUCTION xvii",
    "6 CARL COMICS: CONVERSATIONS",
    "CARL COMICS: CONVERSATIONS 60",
    "CHRONOLOGY",
]
_PAGE_NUMBERS = ["23", "xxviii", "407", "ix"]
_REJECTED_SPANS = ["F", "OO VV", "|", "W", "IY \\"]
_REPRINTED = [
    "Reprinted: *Walt Disney's Comics* No. 449, October 1958",
    "Reprinted: Four Color No. 62",
]
_ELISIONS = ["'49", "'em", "'cause", "'til"]


def _sentence(rng: np.random.RandomState, n_words: int, terminal: str) -> str:
    words = [str(rng.choice(_VOCAB)) for _ in range(n_words)]
    return " ".join(words) + terminal


def gen_documents(n_docs: int, seed: int = 7) -> pd.DataFrame:
    """Generate the interleaved (doc_id, spans) table with planted noise."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        doc_id = f"doc{i:07d}"
        spans: list[dict] = []

        def add(kind: str, text: str = "", media_ref: str = "") -> None:
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
            )

        # running header on ~40% of docs (each template repeats across
        # many docs so the ≥3-distinct-docs rule fires)
        if rng.rand() < 0.4:
            add("text", str(rng.choice(_HEADERS)))
        # unique all-caps headings that must SURVIVE the repeat rule
        # (raw and page-num-stripped forms are unique per doc)
        if rng.rand() < 0.02:
            add("text", f"SECTION {i * 7919} OVERVIEW")
        if rng.rand() < 0.3:
            add("text", str(rng.choice(_PAGE_NUMBERS)))

        # skew: ~1% of docs are splash/index pages with 50-100x spans
        n_para = int(rng.randint(50, 100) * 4) if rng.rand() < 0.01 else rng.randint(3, 9)

        for _ in range(n_para):
            r = rng.rand()
            if r < 0.08:
                add("media", media_ref=f"{doc_id}_img_{len(spans):03d}.png")
                continue
            if r < 0.10:  # unreferenced media (empty ref) — must drop
                add("media")
                continue
            if r < 0.12 and spans and spans[-1]["kind"] == "media":
                # duplicate media_ref — must dedup
                add("media", media_ref=spans[-1]["media_ref"])
                continue
            if r < 0.15:
                add("text", str(rng.choice(_REJECTED_SPANS)))
                continue
            if r < 0.17:
                add("text", str(rng.choice(_REPRINTED)))
                continue

            n_words = rng.randint(4, 12)
            terminal = str(rng.choice([".", "!", "?", ".", "."]))
            text = _sentence(rng, n_words, terminal)

            noise = rng.rand()
            if noise < 0.10:  # soft-hyphen line break inside a word
                w = text.split(" ")[0]
                if len(w) > 3:
                    text = w[:2] + "­\n" + w[2:] + text[len(w):]
            elif noise < 0.20:  # hard-hyphen line break between words
                text = text.replace(" ", "-\n", 1)
            elif noise < 0.28:  # G0 auto-correction target
                text = "G0 " + text
            elif noise < 0.36:  # straight quotes
                text = f'he said "{text}"'
            elif noise < 0.40:  # elision apostrophe
                text = f"back in {rng.choice(_ELISIONS)} {text}"
            elif noise < 0.46:  # inline reprint clause
                text = text + " Reprinted: Four Color No. 9"
            elif noise < 0.52:  # trailing-hyphen span break pair
                add("text", text[:-1] + " every-")
                add("text", "thing " + _sentence(rng, 3, "."))
                continue
            elif noise < 0.60:  # open paragraph across a media span
                add("text", text[:-1])  # strip terminal → open
                add("media", media_ref=f"{doc_id}_fig_{len(spans):03d}.png")
                add("text", _sentence(rng, 4, "."))
                continue
            add("text", text)

        rows.append({"doc_id": doc_id, "spans": spans})
    return pd.DataFrame(rows)


def gen_pages_geom(n_pages: int, seed: int = 11) -> pd.DataFrame:
    """Generate comic pages: panels + OCR boxes + encoded page_image blob.

    Planted cases per FIXTURES.md §2: boxes inside panels, border-
    straddling boxes fixed only by shrink-retry, gutter boxes (-1),
    multi-box bubbles, low-prob and empty-text boxes.
    """
    rng = np.random.RandomState(seed)
    rows = []
    page_w, page_h = 2000, 3000
    for i in range(n_pages):
        doc_id = f"page{i:06d}"
        # 2x3 panel grid with 40px gutters
        panels = []
        pw, ph, gut = 960, 980, 40
        for r in range(3):
            for c in range(2):
                panels.append((gut + c * (pw + gut), gut + r * (ph + gut), pw, ph))
        boxes = []
        n_bubbles = rng.randint(3, 8)
        for _ in range(n_bubbles):
            panel = panels[rng.randint(len(panels))]
            px, py, pw_, ph_ = panel
            # bubble of 1-3 stacked word boxes inside the panel
            bx = px + rng.randint(40, pw_ // 2)
            by = py + rng.randint(40, ph_ // 2)
            n_lines = rng.randint(1, 4)
            for ln in range(n_lines):
                w, h = int(rng.randint(200, 380)), 48
                x0, y0 = bx, by + ln * 56
                quad = [x0, y0 + h, x0 + w, y0 + h, x0 + w, y0, x0, y0]
                text = _sentence(rng, rng.randint(2, 5), "")
                boxes.append((quad, text, float(rng.uniform(0.55, 0.99))))
        # border-straddlers: a tall box sticking 15px / 55px past a panel
        # edge — only the 20px / 60px shrink retry can assign it (J3)
        for overhang, height in ((15, 160), (55, 200)):
            panel = panels[rng.randint(len(panels))]
            px, py, pw_, ph_ = panel
            x0, y0 = px - overhang, py + 300 + overhang
            quad = [x0, y0 + height, x0 + 250, y0 + height, x0 + 250, y0, x0, y0]
            boxes.append((quad, "slow down here", 0.9))
        # gutter box: in no panel even after shrink → panel_num -1
        if rng.rand() < 0.5:
            gx, gy = 2, 2
            quad = [gx, gy + 30, gx + 120, gy + 30, gx + 120, gy, gx, gy]
            boxes.append((quad, "gutter note", 0.8))
        # low-prob and empty-text boxes to drop (F1)
        boxes.append(([100, 148, 300, 148, 300, 100, 100, 100], "ghost text", 0.05))
        boxes.append(([100, 248, 300, 248, 300, 200, 100, 200], "", 0.9))
        # rejected-fragment box (F2)
        boxes.append(([120, 348, 200, 348, 200, 300, 120, 300], "OO", 0.9))

        blob = fakeocr.encode_page(page_w, page_h, panels, boxes)
        rows.append(
            {
                "doc_id": doc_id,
                "page_w": page_w,
                "page_h": page_h,
                "panels": [{"x": x, "y": y, "w": w, "h": h} for x, y, w, h in panels],
                "boxes": [
                    {"box": q, "ocr_text": t, "accepted_text": "", "prob": p}
                    for q, t, p in boxes
                ],
                "page_image": blob,
            }
        )
    return pd.DataFrame(rows)


def gen_page_scans(docs: pd.DataFrame, seed: int = 13) -> pd.DataFrame:
    """Full-page-scan media table for the J9 injection join: every 10th doc."""
    rng = np.random.RandomState(seed)
    del rng  # selection is deterministic by position; seed kept for parity
    picked = docs["doc_id"].iloc[::10]
    return pd.DataFrame(
        {"doc_id": picked, "media_ref": picked.map(lambda d: f"{d}_fullpage.png")}
    ).reset_index(drop=True)
