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
