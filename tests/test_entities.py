"""Entity tagging + rollup semantics (single-pass plan, A6 dominant type)."""

from __future__ import annotations

from barks_ocr_spark.operators import entities


def test_tag_entities_overlap_suppression(spark):
    docs = spark.createDataFrame(
        [(1, "Uncle Scrooge met scrooge near the money bin")],
        "doc_id long, text string",
    )
    out = {
        (r["entity_type"], r["name"]): r["n_mentions"]
        for r in entities.tag_entities(docs).collect()
    }
    assert out[("CHARACTER", "uncle scrooge")] == 1
    # the scrooge inside "uncle scrooge" is suppressed; one standalone stays
    assert out[("CHARACTER", "scrooge")] == 1
    assert out[("PLACE", "money bin")] == 1


def test_tag_entities_single_scan_plan(spark):
    """The plan must scan docs once regardless of dictionary size (the
    round-1 implementation unioned one scan per curated name)."""
    docs = spark.createDataFrame([(1, "spark scan")], "doc_id long, text string")
    plan = entities.tag_entities(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_entity_rollup_dominant_type(spark):
    tagged = spark.createDataFrame(
        [
            (1, "A", "x", 2),
            (2, "A", "x", 1),
            (3, "B", "x", 5),
            (1, "B", "y", 1),
        ],
        "doc_id long, entity_type string, name string, n_mentions int",
    )
    out = {r["name"]: r for r in entities.entity_rollup(tagged).collect()}
    assert out["x"]["dominant_type"] == "A"  # 2 doc-votes for A vs 1 for B
    assert out["x"]["total_mentions"] == 8
    assert out["x"]["n_docs"] == 3
    assert out["x"]["examples"] == [1, 2, 3]
    assert out["y"]["dominant_type"] == "B"
