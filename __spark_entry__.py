"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction query on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2
  (registry in barks_ocr_spark/plans/queries.py).
- ``oracle_sql()``: DuckDB-equivalent SQL for each SQL-expressible query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from barks_ocr_spark.plans import queries as _Q  # noqa: E402
from barks_ocr_spark.session import ensure_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over span-ized sf0.001 docs."""
    ensure_shipped(spark)
    spark.sparkContext.setLogLevel("WARN")
    return _Q.q_extract_spans(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
