"""Shared Spark-vs-DuckDB oracle comparison: the same canonicalization
the driver's correctness gate applies (sort columns by name, normalize
floats to 9 places, order-insensitive row compare). Used by
scripts/check_oracles.py and tests/test_oracle_sweep.py so `pytest`
alone proves every registry query against its oracle.
"""

from __future__ import annotations

import math

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_one(spark, con, name: str, fn, oracle: str | None, sf_dir: str):
    """Run one registry query in Spark and its oracle in DuckDB.

    Returns (status, detail): status is 'match', 'rows-only' (no oracle
    — the weaker check the driver also applies), or an error tag.

    Besides value equality, every query's PHYSICAL PLAN is screened for
    the two unconditional scale red flags — CartesianProduct and
    BroadcastNestedLoopJoin. No registry plan contains either; a new
    operator that introduces one fails the sweep even if its rows are
    right."""
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        w
        for w in ("CartesianProduct", "BroadcastNestedLoopJoin")
        if w in plan
    ]
    if bad:
        return "plan-flag", f"scale red flag in physical plan: {bad}"
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]
    if oracle is None:
        return "rows-only", f"{len(spark_rows)} rows"
    rel = con.sql(oracle)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()
    if sorted(spark_cols) != sorted(duck_cols):
        return "schema-mismatch", f"{sorted(spark_cols)} vs {sorted(duck_cols)}"
    a = canon(spark_rows, spark_cols)
    b = canon(duck_rows, duck_cols)
    if len(a) != len(b):
        return "rowcount-mismatch", f"{len(a)} vs {len(b)}"
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return "value-mismatch", f"first diffs: {diff}"
    return "match", f"{len(a)} rows"
