"""Custom stateful streaming operator: first-occurrence dedup.

The streaming analogue of the exact-dedup operator: a stream of
documents is deduplicated on the content fingerprint, emitting only the
first document ever seen per fingerprint — state = the set of doc_ids
already emitted per fingerprint group, held in Spark's state store via
``applyInPandasWithState`` (the reference's resume caches, R4
`tools/florence_check.py:642-728`, generalized to continuous input).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fp string, doc_id long, is_first boolean"
STATE_SCHEMA = "seen boolean, first_doc long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    if state.exists:
        seen, first_doc = state.get
    else:
        seen, first_doc = False, -1
    out = []
    for pdf in pdfs:
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if not seen:
                out.append({"fp": fp, "doc_id": doc_id, "is_first": True})
                seen, first_doc = True, doc_id
    state.update((seen, first_doc))
    yield pd.DataFrame(out, columns=["fp", "doc_id", "is_first"])


def stream_first_per_fingerprint(docs_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame (fp, doc_id, is_first): exactly one row per
    distinct fingerprint across the whole stream, however batches split.

    Input needs columns (doc_id, fp). Grouping on fp shuffles only
    (fp, doc_id) pairs; state per group is two scalars.
    """
    return (
        docs_stream.select("fp", "doc_id")
        .groupBy("fp")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ── Streaming gap-based sessionization ──────────────────────────────────
# The streaming analogue of the batch event_sessions query: state per
# user = the open session's (seq, last-activity µs, rollup scalars); a
# row whose gap exceeds the threshold CLOSES the open session (emitted)
# and opens a new one. Sessions still open when the stream drains stay
# in state unemitted — deterministic, so the batch oracle is "every
# session except each user's last".

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "first_event long, last_event long"
)
SESSION_STATE_SCHEMA = (
    "session_seq long, last_us long, n_events long, "
    "first_event long, last_event long"
)
SESSION_GAP_US = 1_800_000_000  # 30 min, exact integer microseconds


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        seq, last_us, n, first_ev, last_ev = state.get
    else:
        seq, last_us, n, first_ev, last_ev = 0, -1, 0, -1, -1
    parts = [pdf[["us", "event_id"]] for pdf in pdfs]
    cols = ["user_id", "session_seq", "n_events", "first_event", "last_event"]
    if not parts:
        yield pd.DataFrame([], columns=cols)
        return
    events = pd.concat(parts).sort_values(["us", "event_id"])
    out = []
    for us, eid in events.itertuples(index=False):
        us, eid = int(us), int(eid)
        if n == 0:
            seq, n, first_ev, last_ev = seq + 1, 1, eid, eid
        elif us - last_us > SESSION_GAP_US:
            out.append((user_id, seq, n, first_ev, last_ev))
            seq, n, first_ev, last_ev = seq + 1, 1, eid, eid
        else:
            n += 1
            last_ev = eid
        last_us = us
    state.update((seq, last_us, n, first_ev, last_ev))
    yield pd.DataFrame(out, columns=cols)


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (user_id, session_seq,
    n_events, first_event, last_event): a session is emitted exactly
    when a later event of the same user arrives past the 30-min gap,
    however batches split — state per user is five scalars. Input needs
    columns (user_id, us, event_id) with ``us`` integer epoch
    microseconds (exact gap arithmetic, no timestamp rounding)."""
    return (
        events_stream.select("user_id", "us", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
