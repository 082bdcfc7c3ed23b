"""Arrow-native span-extraction kernel (the flagship's fast path).

Same contract as kernels/spans.py (the golden pandas kernel, which cites
the reference behavior per step) but implemented directly on
``pyarrow.RecordBatch`` for ``DataFrame.mapInArrow``:

 - no Python-object materialization of the nested span structs — the
   pandas path pays dict-per-span at BOTH ends (Arrow→dict on flatten,
   dict→Arrow on nest), which is the dominant memory traffic of the job;
 - all string passes are RE2 / utf8 kernels on contiguous Arrow buffers
   (`pyarrow.compute`), not object-dtype pandas Series;
 - grouping / merge logic is numpy over zero-copy int/bool views;
 - the only per-string Python remaining is the three stateful scans the
   pandas kernel also runs per-string (curly quotes, reprinted-clause
   line truncation, token auto-correct), each gated to the rows whose
   text can possibly change.

Byte-identical parity with kernels/spans.py is pinned by
tests/test_arrow_kernel.py (datagen corpus + adversarial edge docs +
hypothesis-generated documents).

Regex dialect note: pandas uses Python ``re`` (``\\s`` = 29 unicode
whitespace chars incl. \\x1c-\\x1f), Arrow uses RE2 (``\\s`` = ASCII
only, no lookaround). Every translated pattern therefore spells the
whitespace class out explicitly (``_WS`` below — verified equal to
Python's ``\\s`` set over the BMP) and rewrites lookarounds; parity is
test-pinned, not assumed.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from barks_ocr_spark.kernels import textnorm as tn

# Python-`\s` whitespace, spelled out for RE2 (see module docstring).
_WS = (
    r"[\t\n\x0b\f\r\x1c-\x1f \x{0085}\x{00a0}\x{1680}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"
)
# Same class minus the plain space (the repair_linebreaks gate shape).
_WS_NO_SPACE = (
    r"[\t\n\x0b\f\r\x1c-\x1f\x{0085}\x{00a0}\x{1680}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"
)
_TRIM_RE = rf"^{_WS}+|{_WS}+$"
_RTRIM_RE = rf"{_WS}+$"

_PAGE_NUM_TOKEN = r"(?:[ivxlcdmIVXLCDM]{1,8}|\d{1,3})"
_HEADER_SHAPE_RE = rf"^(?:{_PAGE_NUM_TOKEN}{_WS}+\S.*|\S.*{_WS}+{_PAGE_NUM_TOKEN})$"
_LEADING_PAGE_NUM_RE = rf"^{_PAGE_NUM_TOKEN}{_WS}+"
_TRAILING_PAGE_NUM_RE = rf"{_WS}+{_PAGE_NUM_TOKEN}$"

# has_rejected_token without the Python lookahead `(?= |$)`: for a
# boolean *contains* test, consuming the trailing boundary is
# equivalent — if any token matches, the leftmost match still fires.
_REJECTED_RE = (
    r"(?:^| )[\t\n\r\f\v]*(?:"
    + "|".join(re.escape(w) for w in sorted(tn.REJECTED_WORDS))
    + r")[\t\n\r\f\v]*(?: |$)"
)

# paragraph_is_open pieces (tn._PARA_SENTENCE_END_RE / peel rule).
_PARA_END_RE = r"[.!?\x{2026}][\")'\]\x{2019}\x{201d}]*" + _WS + r"*$"
_TRAILING_PAREN_RE = rf"{_WS}*\([^()]*\){_WS}*$"

_AUTO_CORRECT_GATE = "|".join(re.escape(k) for k in tn.AUTO_CORRECTIONS)
_QUOTE_GATE = r"['\"\x{2018}\x{2019}\x{201c}\x{201d}]"

SPAN_ARROW_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
BATCH_ARROW_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_ARROW_TYPE))]
)


def _np_bool(arr: pa.Array) -> np.ndarray:
    """Arrow boolean (possibly null) → dense numpy bool (null=False)."""
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)


def _as_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _trim(arr: pa.Array) -> pa.Array:
    """Python ``str.strip()`` semantics (all unicode whitespace)."""
    return pc.replace_substring_regex(arr, _TRIM_RE, "")


def _rstrip(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, _RTRIM_RE, "")


def _contains(arr: pa.Array, pattern: str, ignore_case: bool = False) -> np.ndarray:
    return _np_bool(pc.match_substring_regex(arr, pattern, ignore_case=ignore_case))


def _replace_where(
    arr: pa.Array, mask: np.ndarray, fn: Callable[[str], str]
) -> pa.Array:
    """Apply a per-string Python function to masked rows only.

    The scatter array holds None everywhere else, so untouched rows never
    round-trip through Python objects.
    """
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return arr
    gated = pc.take(arr, pa.array(idx, type=pa.int64())).to_pylist()
    scatter: list[str | None] = [None] * len(arr)
    for i, v in zip(idx.tolist(), gated):
        scatter[i] = fn(v)
    return pc.if_else(
        pa.array(mask), pa.array(scatter, type=pa.string()), arr
    )


class _Flat:
    """Flat span columns for one batch, sorted by (parent doc, offset).

    ``parent`` indexes the ORIGINAL batch row — doc identity for all
    grouping. (Assumes doc_id rows are unique within a batch, same as
    the pandas kernel's nest-by-doc_id.)
    """

    __slots__ = ("parent", "kind_is_text", "text", "media_ref", "offset")

    def __init__(
        self,
        parent: np.ndarray,
        kind_is_text: np.ndarray,
        text: pa.Array,
        media_ref: pa.Array,
        offset: np.ndarray,
    ) -> None:
        self.parent = parent
        self.kind_is_text = kind_is_text
        self.text = text
        self.media_ref = media_ref
        self.offset = offset

    def __len__(self) -> int:
        return len(self.parent)

    def filter(self, keep: np.ndarray) -> "_Flat":
        if keep.all():
            return self
        k = pa.array(keep)
        return _Flat(
            self.parent[keep],
            self.kind_is_text[keep],
            pc.filter(self.text, k),
            pc.filter(self.media_ref, k),
            self.offset[keep],
        )


def _flatten(batch: pa.RecordBatch) -> _Flat:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):  # pragma: no cover - defensive
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    valid = _np_bool(pc.is_valid(flat))
    kind = pc.fill_null(flat.field("kind"), "")
    text = pc.fill_null(flat.field("text"), "")
    media = pc.fill_null(flat.field("media_ref"), "")
    offset = (
        pc.fill_null(flat.field("offset"), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    is_text = _np_bool(pc.equal(kind, "text"))
    out = _Flat(parent, is_text, text, media, offset)
    if not valid.all():
        out = out.filter(valid)
    # stable (parent, offset) order — same reading order the pandas
    # kernel establishes with its stable sort_values (lexsort is stable,
    # so duplicate (parent, offset) pairs keep input order, like pandas)
    order = np.lexsort((out.offset, out.parent))
    if len(order) and not np.array_equal(order, np.arange(len(order))):
        o = pa.array(order, type=pa.int64())
        out = _Flat(
            out.parent[order],
            out.kind_is_text[order],
            pc.take(out.text, o),
            pc.take(out.media_ref, o),
            out.offset[order],
        )
    return out


def _filter_media(flat: _Flat) -> _Flat:
    """Step 1 (F12): drop empty media_ref; de-dup (doc, media_ref) keep first."""
    is_media = ~flat.kind_is_text
    ref_len = pc.binary_length(flat.media_ref).to_numpy(zero_copy_only=False)
    drop = is_media & (ref_len == 0)
    media_idx = np.flatnonzero(is_media & ~drop)
    if media_idx.size > 1:
        enc = pc.dictionary_encode(flat.media_ref).indices.to_numpy(
            zero_copy_only=False
        )
        key = flat.parent[media_idx].astype(np.int64) * (enc.max() + 1) + enc[
            media_idx
        ].astype(np.int64)
        _, first = np.unique(key, return_index=True)
        dup = np.ones(media_idx.size, dtype=bool)
        dup[first] = False
        drop[media_idx[dup]] = True
    return flat.filter(~drop)


def _filter_boilerplate(flat: _Flat, repeating: frozenset[str]) -> _Flat:
    """Steps 2-4: boilerplate headers, reprint captions, rejected tokens."""
    txt = _trim(flat.text)
    is_text = flat.kind_is_text

    tlen = pc.binary_length(txt).to_numpy(zero_copy_only=False)
    nonempty = tlen > 0
    # standalone page number (≤8 chars, digits or roman)
    page_num = (
        (tlen <= tn.MAX_PAGE_NUMBER_LEN)
        & nonempty
        & (
            _contains(txt, r"^\d+$")
            | _contains(txt, r"^[ivxlcdm]+$", ignore_case=True)
        )
    )
    drop = is_text & page_num
    if repeating:
        rep_list = pa.array(sorted(repeating), type=pa.string())
        in_rep_raw = _np_bool(pc.is_in(txt, value_set=rep_list))
        stripped = _trim(
            pc.replace_substring_regex(
                pc.replace_substring_regex(txt, _LEADING_PAGE_NUM_RE, ""),
                _TRAILING_PAGE_NUM_RE,
                "",
            )
        )
        in_rep_stripped = _np_bool(pc.is_in(stripped, value_set=rep_list))
        cap = tlen <= tn.MAX_RUNNING_HEADER_LEN
        shape = cap & nonempty & _contains(txt, _HEADER_SHAPE_RE)
        allcaps = (
            cap & _contains(txt, "[A-Za-z]") & ~_contains(txt, "[a-z]")
        )
        drop |= is_text & (
            (shape & (in_rep_raw | in_rep_stripped)) | (allcaps & in_rep_raw)
        )
    drop |= is_text & _np_bool(pc.starts_with(txt, tn.REPRINTED_PREFIX))
    drop |= is_text & _contains(txt, _REJECTED_RE, ignore_case=True)
    out = flat.filter(~drop)

    # inline "Reprinted: ..." clause truncation on surviving text spans
    gate = out.kind_is_text & _contains(out.text, "Reprinted")
    if gate.any():
        strip_one = _strip_reprinted_one
        out = _Flat(
            out.parent,
            out.kind_is_text,
            _replace_where(out.text, gate, strip_one),
            out.media_ref,
            out.offset,
        )
    return out


def _strip_reprinted_one(text: str) -> str:
    out = []
    for line in text.split("\n"):
        stripped = tn._REPRINTED_CLAUSE_RE.sub("", line)
        if stripped == line:
            out.append(line)
        elif stripped.strip():
            out.append(stripped.rstrip())
    return "\n".join(out)


def _auto_correct_one(text: str) -> str:
    return " ".join(tn._correct_token(w) for w in text.split(" "))


def _normalize_text(flat: _Flat) -> _Flat:
    """Steps 5-9: linebreak repair, auto-correct, curlify, upper, drop empty.

    Every vectorized pass runs full-array: on already-clean rows each
    replace is the identity, so the pandas kernel's gating (a pure perf
    trick there) is unnecessary — RE2 single-scan passes are cheap.
    The two stateful Python scans stay gated to rows that can change.
    """
    t = flat.text
    # repair_linebreaks (T5/T6): soft hyphens, hyphen-linebreak join,
    # newline→space, whitespace collapse, strip
    t = pc.replace_substring_regex(t, r"\x{00ad}\n?", "")
    t = pc.replace_substring(t, "-\n", "-")
    t = pc.replace_substring(t, "\n", " ")
    t = pc.replace_substring_regex(t, _WS + "+", " ")
    t = _trim(t)
    # auto-correct (F3/T2), gated on a correctable token appearing at all
    gate = _contains(t, _AUTO_CORRECT_GATE) & flat.kind_is_text
    t = _replace_where(t, gate, _auto_correct_one)
    # curly quotes (T14), gated on any quote char
    gate = _contains(t, _QUOTE_GATE) & flat.kind_is_text
    t = _replace_where(t, gate, tn._curlify_one)
    # Barks casing (T1)
    t = pc.utf8_upper(t)
    empty = flat.kind_is_text & (
        pc.binary_length(t).to_numpy(zero_copy_only=False) == 0
    )
    out = _Flat(flat.parent, flat.kind_is_text, t, flat.media_ref, flat.offset)
    return out.filter(~empty)


def _merge_paragraphs(flat: _Flat) -> _Flat:
    """Step 10 (W5/T5): cross-span paragraph merge, media transparent."""
    n = len(flat)
    if n == 0:
        return flat
    is_text = flat.kind_is_text
    tidx = np.flatnonzero(is_text)
    if tidx.size == 0:
        return flat
    take = pa.array(tidx, type=pa.int64())
    t = pc.take(flat.text, take)
    t_parent = flat.parent[tidx]
    t_offset = flat.offset[tidx]

    rt = _rstrip(t)
    empty = pc.binary_length(rt).to_numpy(zero_copy_only=False) == 0
    closed = _contains(rt, _PARA_END_RE)
    peeled = _rstrip(pc.replace_substring_regex(rt, _TRAILING_PAREN_RE, ""))
    peel_hit = _np_bool(pc.not_equal(peeled, rt)) & _contains(peeled, _PARA_END_RE)
    open_flag = ~empty & ~closed & ~peel_hit
    soft = _contains(rt, r"[0-9A-Za-z]-$")
    starts_alnum = _contains(t, r"^[0-9A-Za-z]")

    same_doc = np.empty(tidx.size, dtype=bool)
    same_doc[0] = False
    np.equal(t_parent[1:], t_parent[:-1], out=same_doc[1:])
    prev_open = np.empty_like(same_doc)
    prev_open[0] = False
    prev_open[1:] = open_flag[:-1]
    prev_soft = np.empty_like(same_doc)
    prev_soft[0] = False
    prev_soft[1:] = soft[:-1]
    merges = prev_open & same_doc
    seamless = merges & prev_soft & same_doc & starts_alnum

    group = np.cumsum(~merges)  # 1-based group labels over text rows
    counts = np.bincount(group)
    multi = counts[group] > 1

    if not multi.any():
        return flat

    # singleton text rows and media rows pass through untouched
    s_keep = np.ones(n, dtype=bool)
    s_keep[tidx[multi]] = False

    # merged chains: join precomputed (joiner + text) pieces per group
    joiner = np.full(tidx.size, " ", dtype=object)
    joiner[seamless] = ""
    joiner[~merges] = ""
    m = multi
    pieces = pc.binary_join_element_wise(
        pa.array(joiner[m], type=pa.string()), pc.filter(t, pa.array(m)), ""
    )
    mlabels = group[m]
    starts = np.flatnonzero(np.diff(mlabels, prepend=-1))
    list_offsets = np.append(starts, mlabels.size).astype(np.int32)
    merged_text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(list_offsets), pieces), ""
    )
    m_parent = t_parent[m][starts]
    m_offset = t_offset[m][starts]  # first member's position (offsets asc)

    # reassemble: surviving rows + merged rows, back in (parent, offset) order
    keep = pa.array(s_keep)
    parent = np.concatenate([flat.parent[s_keep], m_parent])
    offset = np.concatenate([flat.offset[s_keep], m_offset])
    kind_is_text = np.concatenate(
        [flat.kind_is_text[s_keep], np.ones(len(m_parent), dtype=bool)]
    )
    text = pa.concat_arrays(
        [_as_array(pc.filter(flat.text, keep)), _as_array(merged_text)]
    )
    empties = pc.fill_null(pa.nulls(len(m_parent), pa.string()), "")
    media_ref = pa.concat_arrays(
        [_as_array(pc.filter(flat.media_ref, keep)), _as_array(empties)]
    )
    order = np.lexsort((offset, parent))
    o = pa.array(order, type=pa.int64())
    return _Flat(
        parent[order],
        kind_is_text[order],
        pc.take(text, o),
        pc.take(media_ref, o),
        offset[order],
    )


def _nest(flat: _Flat, batch: pa.RecordBatch) -> pa.RecordBatch:
    """Step 11 + re-nest: renumber offsets 0..n-1, build list<struct>."""
    n_docs = batch.num_rows
    parent = flat.parent
    counts = np.bincount(parent, minlength=n_docs) if len(flat) else np.zeros(
        n_docs, dtype=np.int64
    )
    # renumber: position within doc (parent-sorted ⇒ arange minus run start)
    if len(flat):
        idx = np.arange(len(flat), dtype=np.int64)
        run_start = np.repeat(np.cumsum(counts) - counts, counts)
        new_offset = idx - run_start
    else:
        new_offset = np.empty(0, dtype=np.int64)
    is_text_pa = pa.array(flat.kind_is_text)
    kind = pc.if_else(is_text_pa, pa.scalar("text"), pa.scalar("media"))
    text = pc.if_else(is_text_pa, flat.text, pa.scalar(""))
    media_ref = pc.if_else(is_text_pa, pa.scalar(""), flat.media_ref)
    struct = pa.StructArray.from_arrays(
        [
            _as_array(kind),
            _as_array(text),
            _as_array(media_ref),
            pa.array(new_offset.astype(np.int32)),
        ],
        fields=list(SPAN_ARROW_TYPE),
    )
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    )
    spans = pa.ListArray.from_arrays(offsets, struct)
    return pa.RecordBatch.from_arrays(
        [batch.column("doc_id"), spans], schema=BATCH_ARROW_SCHEMA
    )


def extract_batch(
    batch: pa.RecordBatch, repeating: frozenset[str]
) -> pa.RecordBatch:
    """Full per-document pipeline on one Arrow batch (nested in/out)."""
    if batch.num_rows == 0:
        return pa.RecordBatch.from_arrays(
            [
                pa.array([], type=pa.string()),
                pa.array([], type=pa.list_(SPAN_ARROW_TYPE)),
            ],
            schema=BATCH_ARROW_SCHEMA,
        )
    flat = _flatten(batch)
    flat = _filter_media(flat)
    flat = _filter_boilerplate(flat, repeating)
    flat = _normalize_text(flat)
    flat = _merge_paragraphs(flat)
    return _nest(flat, batch)
