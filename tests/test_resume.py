"""Idempotent resume: kill-and-rerun semantics, zero duplicate spans."""

from __future__ import annotations

from barks_ocr_spark.datagen import docs as dg
from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA
from barks_ocr_spark.sources.checkpoint import ExtractionJob
from barks_ocr_spark.sources.snapshots import SnapshotTable


def test_snapshot_table_commit_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.range(3).selectExpr("cast(id as string) as doc_id")
    df2 = spark.range(3, 5).selectExpr("cast(id as string) as doc_id")
    s0 = t.append(df1)
    s1 = t.append(df2)
    assert (s0, s1) == (0, 1)
    assert t.read(spark).count() == 5
    assert t.read(spark, upto_snapshot=0).count() == 3  # time travel


def test_partial_run_then_resume_no_duplicates(spark, tmp_path):
    docs_pdf = dg.gen_documents(120, seed=21)
    docs = spark.createDataFrame(docs_pdf, schema=DOCUMENTS_SPANS_SCHEMA)
    job = ExtractionJob(str(tmp_path / "res"), str(tmp_path / "ckpt"))

    # simulate a partial (killed-after-commit) run: first 50 docs only
    first_half = docs.filter("doc_id < 'doc0000050'")
    r1 = job.run(spark, first_half)
    assert r1["docs"] == 50

    # full rerun: must process ONLY the remaining 70
    r2 = job.run(spark, docs)
    assert r2["docs"] == 70

    # third run: everything committed → no-op
    r3 = job.run(spark, docs)
    assert r3["docs"] == 0

    result = job.read_results(spark)
    assert result.count() == 120
    assert result.select("doc_id").distinct().count() == 120  # zero dupes

    ckpt = job.read_checkpoints(spark)
    rows = ckpt.collect()
    assert sum(r["pages_processed"] for r in rows) == 120
    snap_ids = {r["snapshot_id"] for r in rows}
    assert snap_ids == {0, 1}


def test_uncommitted_snapshot_invisible(spark, tmp_path):
    """Crash between data write and manifest commit → data invisible."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(2).selectExpr("cast(id as string) as doc_id"))
    # simulate crash: data dir exists but no manifest entry
    orphan = tmp_path / "t" / "snap-000099"
    spark.range(9).selectExpr("cast(id as string) as doc_id").write.parquet(str(orphan))
    assert t.read(spark).count() == 2
