"""Hypertable-style chunked rollup: time-partitioned continuous
aggregates with chunk-pruned incremental refresh.

The TimescaleDB continuous-aggregate idea, Spark-native: the rollup is
a parquet table PARTITIONED BY the time chunk (day), and a refresh
recomputes ONLY the chunks whose source data changed — via dynamic
partition overwrite, so untouched chunk directories are never
rewritten, read, or even listed for write. Readers see per-chunk
atomic replacement.

Scale shape: a day's refresh scans one day of source (partition-pruned
filter on the chunk column), aggregates map-side-partial, and
overwrites one output directory. The full-history rollup never
recomputes; backfills touch exactly the backfilled chunks. This is the
batch complement of streaming/incremental.py's watermarked aggregate —
streams maintain the current chunk, this maintains history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_chunk(events: DataFrame) -> DataFrame:
    return events.withColumn("day", F.to_date("ts"))


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(day, hour, event_type, n_events, total_value) — the continuous
    aggregate's defining query."""
    return (
        _with_chunk(events)
        .groupBy(
            "day",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


def rollup_write(events: DataFrame, path: str) -> None:
    """Full build: the rollup materialized partitioned by day chunk."""
    (
        hourly_rollup(events)
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def rollup_refresh(
    events: DataFrame, path: str, days: list[str]
) -> None:
    """Incremental refresh: recompute ONLY the given day chunks.

    The source filter prunes the scan to the changed days, and dynamic
    partition overwrite replaces exactly those chunk directories —
    every other day's files are untouched (pinned by
    test_refresh_rewrites_only_changed_chunk)."""
    spark = events.sparkSession
    changed = _with_chunk(events).filter(
        F.col("day").cast("string").isin([str(d) for d in days])
    )
    rolled = hourly_rollup(changed.drop("day"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rolled.repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def rollup_read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
