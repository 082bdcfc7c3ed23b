"""Local stand-in for the driver's correctness gate: run every query in
Spark and its oracle in DuckDB at the given sf_dir, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from barks_ocr_spark.plans import queries as Q  # noqa: E402
from barks_ocr_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = Q.queries(), Q.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only, {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCK ERROR: {e}"))
            print(f"✗ {name}: DUCK ERROR {e}")
            continue
        sc = sorted(c.lower() for c in spark_cols)
        dc = sorted(duck_cols)
        if sc != dc:
            failures.append((name, f"SCHEMA {sc} vs {dc}"))
            print(f"✗ {name}: SCHEMA mismatch {sc} vs {dc}")
            continue
        a = canon(spark_rows, [c.lower() for c in spark_cols])
        b = canon(duck_rows, duck_cols)
        if len(a) != len(b):
            failures.append((name, f"ROWS {len(a)} vs {len(b)}"))
            print(f"✗ {name}: ROW COUNT {len(a)} vs {len(b)}")
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"VALUES differ, e.g. {diff}"))
            print(f"✗ {name}: VALUES differ, first diffs: {diff}")
            continue
        print(f"✓ {name}: {len(a)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
