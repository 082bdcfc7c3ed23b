"""Hypertable-style chunked rollup: time-partitioned continuous
aggregates with chunk-pruned incremental refresh.

The TimescaleDB continuous-aggregate idea, Spark-native: the rollup is
a parquet table PARTITIONED BY the time chunk (day), and a refresh
recomputes ONLY the chunks whose source data changed — via dynamic
partition overwrite, so untouched chunk directories are never
rewritten, read, or even listed for write. Readers see per-chunk
atomic replacement.

Scale shape: a day's refresh scans one day of source (half-open ts
range predicates, pushed to the parquet scan so row-group min/max
stats skip every other day; with a ts-partitioned source the same
predicates partition-prune), aggregates map-side-partial, and
overwrites one output directory. The full-history rollup never
recomputes; backfills touch exactly the backfilled chunks. This is the
batch complement of streaming/incremental.py's watermarked aggregate —
streams maintain the current chunk, this maintains history.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession
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


def day_range_filter(days: list[str], ts_col: str = "ts") -> Column:
    """OR of half-open [day 00:00, next-day 00:00) timestamp ranges.

    Plain ``ts >= lit AND ts < lit`` comparisons on the stored column —
    no ``to_date(ts)`` computed column — so the predicate reaches the
    parquet scan as PushedFilters and row-group min/max stats skip every
    untouched day (pinned by test_refresh_filter_is_pushed_down). At
    100 TB this is what makes a one-day refresh read one day instead of
    the corpus."""
    cond: Column | None = None
    for d in days:
        day = datetime.date.fromisoformat(str(d))
        nxt = day + datetime.timedelta(days=1)
        this = (F.col(ts_col) >= F.lit(day.isoformat()).cast("timestamp")) & (
            F.col(ts_col) < F.lit(nxt.isoformat()).cast("timestamp")
        )
        cond = this if cond is None else (cond | this)
    if cond is None:
        return F.lit(False)
    return cond


def _delete_day_chunks(spark: SparkSession, path: str, days: list[str]) -> None:
    """Remove the given day partition directories via the Hadoop
    FileSystem API (works for file://, hdfs://, s3a:// alike)."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(path)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    for d in days:
        chunk = jvm.org.apache.hadoop.fs.Path(path, f"day={d}")
        if fs.exists(chunk):
            fs.delete(chunk, True)


def rollup_refresh(
    events: DataFrame, path: str, days: list[str]
) -> None:
    """Incremental refresh: recompute ONLY the given day chunks.

    The source filter is a pushdown-able half-open ``ts`` range per day
    (see day_range_filter), and dynamic partition overwrite replaces
    exactly those chunk directories — every other day's files are
    untouched (pinned by test_refresh_rewrites_only_changed_chunk).
    A requested day whose source rows have vanished (retraction /
    deletion) gets its stale chunk directory deleted explicitly, so the
    read-back always equals the defining query over the refreshed days
    (pinned by test_refresh_clears_vanished_chunk)."""
    # The refresh collects per-day results driver-side; the request list
    # bounds that collect, so reject absurd lists instead of OOMing the
    # driver (a full-history rebuild should write the rollup wholesale,
    # not enumerate every day through the incremental path).
    if len(days) > 10_000:
        raise ValueError(
            f"rollup_refresh got {len(days)} days; incremental refresh is "
            "bounded at 10000 — rebuild the rollup wholesale instead"
        )
    spark = events.sparkSession
    changed = events.filter(day_range_filter([str(d) for d in days]))
    rolled = hourly_rollup(changed)
    # Aggregate output is tiny (≤ hours×types rows per refreshed day);
    # persist so the days-present probe and the write share one source
    # scan instead of two.
    rolled = rolled.persist()
    try:
        present = {
            str(r["day"]) for r in rolled.select("day").distinct().collect()
        }
        vanished = [str(d) for d in days if str(d) not in present]
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
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
        if vanished:
            _delete_day_chunks(spark, path, vanished)
    finally:
        rolled.unpersist()


def rollup_read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
