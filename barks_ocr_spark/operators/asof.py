"""Point-in-time (as-of) join, Spark-native.

For every left row, attach the payload of the single right row with the
greatest timestamp ≤ the left row's timestamp within the same key — the
event-to-dimension-history alignment (prices, configs, latest prior
activity) that Spark has no built-in operator for.

Implementation: the union trick, never a range cross-join. Left rows are
tagged side=1, right rows side=0, the union is windowed per key ordered
by (ts, side) — right sorts first at equal timestamps, so "at-or-before"
holds — and ``last(payload, ignorenulls=True)`` over the preceding frame
carries the newest right payload forward onto each left row.

Scale shape: ONE shuffle on the key (the same hash-partition a plain
equi-join would pay) and one ordered pass per partition; all the
``last()`` columns share a single Window operator (same spec), so the
sort happens once. A per-key skew (one user with millions of events)
behaves exactly like the same skew in a window aggregate — mitigate
upstream with the skew module if a key is genuinely pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload: dict[str, str],
) -> DataFrame:
    """Left as-of join: ``left``'s columns plus, for each ``payload``
    entry (right column → output alias), the value from the newest right
    row with ``right.ts_col <= left.ts_col`` on the same ``keys`` (null
    when no such row exists).

    Right rows must be unique per (keys, ts) — duplicate right
    timestamps within a key make "the" as-of row ambiguous (DuckDB's
    ASOF JOIN has the same precondition)."""
    lcols = list(left.columns)
    tagged_left = left.withColumn("_side", F.lit(1))
    for rc in payload:
        tagged_left = tagged_left.withColumn(
            f"_r_{rc}", F.lit(None).cast(right.schema[rc].dataType)
        )
    tagged_right = right.select(
        *keys,
        F.col(ts_col),
        *[F.col(rc).alias(f"_r_{rc}") for rc in payload],
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in keys and c != ts_col:
            tagged_right = tagged_right.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for rc, alias in payload.items():
        u = u.withColumn(alias, F.last(f"_r_{rc}", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(*lcols, *payload.values())
