"""Point-in-time (as-of) join, Spark-native.

For every left row, attach the payload of the single right row with the
greatest timestamp ≤ the left row's timestamp within the same key — the
event-to-dimension-history alignment (prices, configs, latest prior
activity) that Spark has no built-in operator for.

Implementation: the union trick, never a range cross-join. Left rows are
tagged side=1, right rows side=0, the union is windowed per key ordered
by (ts, side) — right sorts first at equal timestamps, so "at-or-before"
holds — and a single ``last(struct(payload...), ignorenulls=True)`` over
the preceding frame carries the newest right row forward onto each left
row. Packing every payload column into ONE struct makes the match
atomic: all output payload columns come from the SAME right row, and a
matched row whose payload value is genuinely NULL yields NULL (DuckDB
ASOF / pandas merge_asof semantics) instead of leaking an older row's
value. Right rows with a NULL timestamp are dropped up front — they can
never be "at or before" anything (DuckDB ASOF treats them as no match).

Scale shape: ONE shuffle on the key (the same hash-partition a plain
equi-join would pay) and one ordered pass per partition; the single
struct-valued ``last()`` means one window column regardless of payload
width. A per-key skew (one user with millions of events)
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
    ASOF JOIN has the same precondition). Right rows with a NULL
    ``ts_col`` are ignored (no match, DuckDB parity); a matched right
    row's NULL payload value is returned as NULL, never an older row's
    value."""
    import pyspark.sql.types as T

    lcols = list(left.columns)
    struct_t = T.StructType(
        [T.StructField(rc, right.schema[rc].dataType, True) for rc in payload]
    )
    tagged_left = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_r_payload", F.lit(None).cast(struct_t))
    )
    tagged_right = (
        right.filter(F.col(ts_col).isNotNull())
        .select(
            *keys,
            F.col(ts_col),
            F.struct(*[F.col(rc) for rc in payload]).alias("_r_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
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
    u = u.withColumn("_r_match", F.last("_r_payload", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_r_match")[rc].alias(alias) for rc, alias in payload.items()],
    )
