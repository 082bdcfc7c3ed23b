"""Skew operators: salted join correctness + book assembly round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barks_ocr_spark.operators import skew
from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA


def _span(kind, text, media_ref, offset):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _books(spark):
    rows = [
        # multi-page book with media spans interleaved
        (
            "book_a",
            [_span("text", f"t{i}", "", i) if i % 3 else _span("media", None, f"m{i}", i) for i in range(11)],
        ),
        ("book_b", [_span("text", "only", "", 0)]),
        ("book_empty", []),  # empty span array must survive the round trip
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SPANS_SCHEMA)


def test_paginate_assemble_round_trip(spark):
    docs = _books(spark)
    pages = skew.paginate_spans(docs, page_size=3)
    back = skew.assemble_book_spans(pages)
    want = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in docs.collect()}
    got = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in back.collect()}
    assert got == want


def test_paginate_is_shuffle_free(spark):
    plan = skew.paginate_spans(_books(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assembly_deterministic_across_partitionings(spark):
    docs = _books(spark)
    pages = skew.paginate_spans(docs, page_size=2)
    a = skew.assemble_book_spans(pages.repartition(1)).collect()
    b = skew.assemble_book_spans(pages.repartition(7)).collect()
    canon = lambda rows: sorted((r["doc_id"], [tuple(s) for s in r["spans"]]) for r in rows)  # noqa: E731
    assert canon(a) == canon(b)


def _skewed_facts(spark):
    # key 'hot' owns 90% of rows
    rows = [(i, "hot" if i % 10 else f"cold{i}", float(i)) for i in range(200)]
    return spark.createDataFrame(rows, "fact_id long, k string, v double")


def _dim(spark):
    keys = ["hot"] + [f"cold{i}" for i in range(0, 200, 10)]
    return spark.createDataFrame([(k, f"name_{k}") for k in keys], "k string, name string")


def test_salted_join_matches_plain_join(spark):
    facts, dim = _skewed_facts(spark), _dim(spark)
    plain = facts.join(dim, "k").select("fact_id", "k", "v", "name")
    salted = skew.salted_join(facts, dim, on="k", salt_src="fact_id", buckets=4).select(
        "fact_id", "k", "v", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_preserves_unmatched_facts(spark):
    facts = _skewed_facts(spark)
    dim = _dim(spark).filter(F.col("k") != "hot")  # hot key unmatched
    out = skew.salted_join(facts, dim, on="k", salt_src="fact_id", buckets=4, how="left")
    hot = out.filter(F.col("k") == "hot")
    assert hot.count() == 180
    assert hot.filter(F.col("name").isNull()).count() == 180


def test_salted_join_rejects_right_join(spark):
    with pytest.raises(ValueError):
        skew.salted_join(_skewed_facts(spark), _dim(spark), on="k", salt_src="fact_id", how="right")


def test_fact_salt_spreads_hot_key(spark):
    facts = _skewed_facts(spark).withColumn("s", skew.fact_salt("fact_id", 4))
    spread = (
        facts.filter(F.col("k") == "hot").select("s").distinct().count()
    )
    assert spread == 4  # the hot key's rows land on every salt bucket


def test_fact_salt_deterministic(spark):
    facts = _skewed_facts(spark)
    a = facts.withColumn("s", skew.fact_salt("fact_id", 8)).collect()
    b = facts.withColumn("s", skew.fact_salt("fact_id", 8)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
