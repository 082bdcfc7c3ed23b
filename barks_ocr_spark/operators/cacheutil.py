"""Session cache registry for operator intermediates.

Several operators persist() an intermediate that feeds both sides of a
self-join (shingle tables, LSH signatures). The returned plans are lazy,
so the operator builders can't unpersist after the consuming action —
instead every persist is registered here and long-lived sessions release
the storage memory between operator calls via
:func:`unpersist_intermediates` (bench.py does this after each timed
query; one-shot driver runs don't need to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_intermediates() -> None:
    """Release every operator-persisted intermediate in this session."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
