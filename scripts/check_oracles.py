"""Local stand-in for the driver's correctness gate: run every query in
Spark and its oracle in DuckDB at the given sf_dir, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from barks_ocr_spark import oracle  # noqa: E402
from barks_ocr_spark.plans import queries as Q  # noqa: E402
from barks_ocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    oracle.register_views(con, sf_dir)

    qs, oracles = Q.queries(), Q.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            status, detail = oracle.compare_one(
                spark, con, name, fn, oracles.get(name), sf_dir
            )
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ERROR: {e}"))
            print(f"✗ {name}: ERROR {e}")
            continue
        if status == "match":
            print(f"✓ {name}: {detail}")
        elif status == "rows-only":
            print(f"~ {name}: rows-only, {detail}")
        else:
            failures.append((name, f"{status}: {detail}"))
            print(f"✗ {name}: {status} {detail}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
