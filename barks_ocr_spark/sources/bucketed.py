"""Bucketed table storage: pay the shuffle once at write time.

At 100 TB the dominant recurring cost of the index/compare workloads is
re-shuffling the same big tables on the same keys every run. Bucketed
parquet tables fix the physical layout at write time — `bucketBy(n, key)`
hash-partitions rows into n files per write task and records the
bucketing spec in the catalog — so every later equi-join or aggregation
on the bucket key reads co-located data and plans with NO Exchange on
that side (pinned by test_bucketed_join_is_exchange_free).

Intended layouts for this engine:
- inverted index bucketed+sorted by ``term`` — search joins and
  doc-frequency rollups shuffle nothing;
- documents/spans bucketed by ``doc_id`` — the resume anti-join
  (sources/checkpoint.py) and the compare/verify doc joins co-locate.

Spark bucketing requires a catalog table (`saveAsTable`), not a bare
path: the bucketing contract lives in the metastore.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Unqualified table names land in this database, whose LOCATION is set
# explicitly (not the session default spark-warehouse under the driver's
# cwd — which may not be writable in a hosted driver). Override the root
# with $SPARK_GRAFT_BUCKETED_DIR; a production deployment points it at
# the object-store prefix.
BUCKETED_DB = "barks_bk"


def _qualify(spark: SparkSession, table: str) -> str:
    if "." in table:
        return table
    root = os.environ.get("SPARK_GRAFT_BUCKETED_DIR", "/tmp/barks_bk_warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {BUCKETED_DB} LOCATION '{root}'")
    return f"{BUCKETED_DB}.{table}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``num_buckets`` should give files in the 100 MB–1 GB range at
    the target scale; sorting within buckets additionally removes the
    Sort under a sort-merge join on the bucket key."""
    spark = df.sparkSession
    table = _qualify(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog is per-session but table directories persist:
    # an orphaned location from an earlier session blocks saveAsTable,
    # so clear it explicitly
    import shutil
    from urllib.parse import urlparse

    db, name = table.split(".", 1)
    loc = spark.catalog.getDatabase(db).locationUri
    shutil.rmtree(f"{urlparse(loc).path}/{name}", ignore_errors=True)
    # r7 note (guide §6 "small files", examined and left alone): Spark
    # 4's V1 bucketed write already enforces a hash distribution on the
    # bucket column, so the table lands as exactly num_buckets files
    # without help; an explicit pre-repartition was A/B'd and is a
    # small LOSS (0.69 s vs 0.61 s for the sf1.0 fingerprint index —
    # a redundant second exchange).
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def session_table(base: str) -> str:
    """Per-process table name: ``<base>_p<pid>``.

    Two concurrent runs against the same scale factor (parallel bench /
    test / driver-gate processes) must not drop each other's table mid-
    query — write_bucketed drops-and-recreates, so a shared
    deterministic name is a race (ADVICE r3). The pid token isolates
    live runs; sweep_orphans reclaims dirs left by dead ones, so the
    warehouse doesn't accumulate round-2's pid-orphan litter either."""
    return f"{base}_p{os.getpid()}"


def sweep_orphans(base: str) -> None:
    """Remove warehouse dirs ``<base>_p<pid>`` whose owning process is
    gone. Local-filesystem heuristic for this sandbox's repeated
    bench/test runs; a production deployment scopes names by job run-id
    and reclaims via storage lifecycle rules instead."""
    import shutil

    root = os.environ.get("SPARK_GRAFT_BUCKETED_DIR", "/tmp/barks_bk_warehouse")
    if not os.path.isdir(root):
        return
    prefix = f"{base}_p"
    for name in os.listdir(root):
        if not name.startswith(prefix) or not name[len(prefix):].isdigit():
            continue
        pid = int(name[len(prefix):])
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user — not an orphan


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucketing spec comes from the
    catalog; a plain ``spark.read.parquet(path)`` would lose it)."""
    return spark.table(_qualify(spark, table))
