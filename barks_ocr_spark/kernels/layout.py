"""Layout kernels: line rewrap, text-fit estimation, column split,
blockquote indent detection (SURVEY.md T11/T12/W3/W4).

Pure pandas/numpy, consumed via Arrow-batched UDFs on the Spark side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# T12 constants — src/barks_ocr/tools/ocr_check.py:33-38
FONT_HEIGHT_FACTOR = 0.75
MIN_FONT_SIZE = 8
WIDTH_TOLERANCE = 1.5
WIDTH_TOLERANCE_LOOSE = 4.0  # sound effects / background text

# Deterministic per-char width table (em units ×1000) standing in for
# real font metrics — monospace-ish with narrow/wide classes so the
# fit check exercises real variance.
_NARROW = set("iljtf!.,;:'|")
_WIDE = set("MWmw@")


def _char_width_units(ch: str) -> int:
    if ch in _NARROW:
        return 400
    if ch in _WIDE:
        return 1000
    if ch == " ":
        return 500
    return 700


def rendered_width(text: str, font_size: float) -> float:
    """Deterministic rendered line width in px."""
    return sum(_char_width_units(c) for c in text) / 1000.0 * font_size


def rewrap_to_pattern(text: str, pattern: str) -> str:
    """T11: re-wrap ``text`` so each line carries the word counts of
    ``pattern``'s lines; the last pattern line absorbs the remainder.

    Reference-parity port of ``_apply_line_pattern``
    (`src/barks_ocr/tools/ocr_check.py:156-182`), including the edge
    semantics VERDICT r3 flagged as divergent: blank pattern lines
    count as 0-word lines and emit empty output lines; a whitespace-
    only source returns ``""`` (not the original text); the LAST
    pattern line is emitted even when no words remain (trailing empty
    line); and words exhausted before a non-last pattern line truncate
    the output with no remainder line. Pinned by
    tests/test_rewrap_parity.py against a verbatim transcription of the
    reference function."""
    line_counts = [len(ln.split()) for ln in pattern.rstrip("\n").split("\n")]
    words = text.split()
    if not words:
        return ""
    out: list[str] = []
    i = 0
    last_idx = len(line_counts) - 1
    for idx, count in enumerate(line_counts):
        if idx == last_idx:
            out.append(" ".join(words[i:]))
            break
        if i >= len(words):
            break
        out.append(" ".join(words[i : i + count]))
        i += count
    return "\n".join(out)


def text_fits_box(
    text: str,
    box_w: int,
    box_h: int,
    loose: bool = False,
) -> bool:
    """T12: estimated font size from box height and line count; fits when
    the widest rendered line ≤ box_w × tolerance
    (`src/barks_ocr/tools/ocr_check.py:75-153`, constants `:33-38`)."""
    lines = [ln for ln in text.split("\n") if ln.strip()] or [text]
    font_size = max(box_h / len(lines) * FONT_HEIGHT_FACTOR, MIN_FONT_SIZE)
    tol = WIDTH_TOLERANCE_LOOSE if loose else WIDTH_TOLERANCE
    widest = max(rendered_width(ln, font_size) for ln in lines)
    return widest <= box_w * tol


def rewrap_series(texts: pd.Series, patterns: pd.Series) -> pd.Series:
    return pd.Series(
        [rewrap_to_pattern(t or "", p or "") for t, p in zip(texts, patterns)],
        index=texts.index,
    )


def fits_series(
    texts: pd.Series, ws: pd.Series, hs: pd.Series, loose: pd.Series | None = None
) -> pd.Series:
    loose_vals = loose if loose is not None else pd.Series(False, index=texts.index)
    return pd.Series(
        [
            text_fits_box(t or "", int(w), int(h), bool(lo))
            for t, w, h, lo in zip(texts, ws, hs, loose_vals)
        ],
        index=texts.index,
    )


# ── W3/W4: column split + blockquote indent (books pipeline) ────────────
# Constants from books/src/llama-parse-build-epub.py:255-277.
COLUMN_SPLIT_MIN_JUMP_PT = 100.0
COLUMN_SPLIT_PAGE_FRACTION = 0.30
BLOCKQUOTE_INDENT_PT = 15.0


def split_columns(xs: np.ndarray, page_width: float) -> np.ndarray:
    """W3: column label per item — a new column starts when consecutive
    items' x jumps by ≥ min(100pt, 0.30·page_width)
    (`books/src/llama-parse-build-epub.py:279-360`)."""
    xs = np.asarray(xs, dtype=np.float64)
    if xs.size == 0:
        return np.zeros(0, dtype=np.int64)
    thresh = min(COLUMN_SPLIT_MIN_JUMP_PT, COLUMN_SPLIT_PAGE_FRACTION * page_width)
    jumps = np.zeros(xs.size, dtype=bool)
    jumps[1:] = (xs[1:] - xs[:-1]) >= thresh
    return np.cumsum(jumps).astype(np.int64)


def blockquote_flags(xs: np.ndarray, columns: np.ndarray) -> np.ndarray:
    """W4: items indented ≥15pt beyond their column's median left-x are
    blockquotes (`books/src/llama-parse-build-epub.py:481-512`)."""
    xs = np.asarray(xs, dtype=np.float64)
    columns = np.asarray(columns, dtype=np.int64)
    out = np.zeros(xs.size, dtype=bool)
    for col in np.unique(columns):
        m = columns == col
        med = np.median(xs[m])
        out[m] = xs[m] >= med + BLOCKQUOTE_INDENT_PT
    return out


# ── A8: footnote sessionization (books pipeline) ─────────────────────────
def _fold_footnote_texts(texts: list[str]) -> str:
    """Exact continuation-fold semantics of
    `books/src/llama-parse-build-epub.py:397-411` (_merge_footnote
    _continuations): each fold rstrips the accumulated head and lstrips
    the incoming tail, single-space join."""
    acc = texts[0]
    for t in texts[1:]:
        acc = f"{acc.rstrip()} {t.lstrip()}"
    return acc


def fold_footnotes(items: pd.DataFrame) -> pd.DataFrame:
    """A8: fold consecutive footnote-labeled items into their head item.

    ``items``: columns (doc_id, pos, text, is_footnote), reading order.
    A new footnote group starts when a footnote item's text begins with
    ``*`` / ``\\*`` (lstripped) or it is the document's first footnote;
    later marker-less footnote items are continuations folded into the
    head; non-footnote items pass through untouched
    (`books/src/llama-parse-build-epub.py:376-411`).
    """
    if len(items) == 0:
        return items.copy()
    items = items.sort_values(["doc_id", "pos"], kind="stable", ignore_index=True)
    fn = items[items["is_footnote"].astype(bool)]
    if len(fn) == 0:
        return items
    starts = fn["text"].fillna("").str.lstrip().str.startswith(("\\*", "*"))
    first_in_doc = ~fn["doc_id"].duplicated()
    gid = (starts | first_in_doc).cumsum()
    sizes = gid.map(gid.value_counts())
    out = items.copy()
    if (sizes > 1).any():
        multi = fn[sizes > 1]
        folded = (
            multi["text"]
            .fillna("")
            .groupby(gid[sizes > 1])
            .agg(lambda s: _fold_footnote_texts(list(s)))
        )
        heads = multi.groupby(gid[sizes > 1]).head(1)
        out.loc[heads.index, "text"] = folded.to_numpy()
        tails = multi.index.difference(heads.index)
        out = out.drop(index=tails)
    return out.reset_index(drop=True)
