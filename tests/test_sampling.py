"""Deterministic sampling operators: per-group caps, train/test split."""

from __future__ import annotations

from pyspark.sql import functions as F

from barks_ocr_spark.operators import sampling


def _docs(spark):
    rows = [(i, f"src{i % 3}") for i in range(90)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_cap_binds_and_is_subset(spark):
    docs = _docs(spark)
    out = sampling.cap_per_group(docs, "source", cap=10)
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"src0": 10, "src1": 10, "src2": 10}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert {r["doc_id"] for r in out.collect()} <= all_ids


def test_cap_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in sampling.cap_per_group(docs.repartition(1), "source", 7).collect()}
    b = {r["doc_id"] for r in sampling.cap_per_group(docs.repartition(13), "source", 7).collect()}
    assert a == b


def test_split_deterministic_and_disjoint(spark):
    docs = _docs(spark)
    out = sampling.split_train_test(docs, test_frac=0.25)
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {(r["doc_id"], r["split"]) for r in sampling.split_train_test(docs.repartition(7), 0.25).collect()}
    assert a == b
    assert {s for _, s in a} == {"train", "test"}


def test_split_is_shuffle_free(spark):
    plan = (
        sampling.split_train_test(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_split_frac_tracks_threshold(spark):
    rows = [(i,) for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long")
    out = sampling.split_train_test(docs, test_frac=0.1)
    n_test = out.filter(F.col("split") == "test").count()
    assert 300 <= n_test <= 500  # ~10% of 4000, md5-binomial spread


def test_pack_documents_properties(spark):
    rows = [(i, "word " * (i % 50 + 1)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.pack_documents(docs, budget=100, n_shards=4)
    rowsc = out.collect()
    assert len(rowsc) == 200  # every doc assigned exactly once
    # pack ids contiguous from 0 within each shard
    by_shard = {}
    for r in rowsc:
        by_shard.setdefault(r["shard"], set()).add(r["pack_id"])
    for shard, packs in by_shard.items():
        assert packs == set(range(len(packs)))
    # deterministic across partitionings
    again = sampling.pack_documents(docs.repartition(7), budget=100, n_shards=4).collect()
    assert sorted(map(tuple, rowsc)) == sorted(map(tuple, again))


def test_pack_start_offset_semantics(spark):
    # 3 docs of 60 tokens in one shard, budget 100: starts at 0, 60, 120
    # → packs 0, 0, 1 (concat-and-chunk assigns by START offset)
    rows = [(0, "tok " * 60), (4, "tok " * 60), (8, "tok " * 60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.pack_documents(docs, budget=100, n_shards=4)
    packs = sorted(r["pack_id"] for r in out.collect())
    assert packs == [0, 0, 1]


def test_split_extreme_fracs(spark):
    docs = _docs(spark)
    all_test = {r["split"] for r in sampling.split_train_test(docs, 1.0).collect()}
    assert all_test == {"test"}
    all_train = {r["split"] for r in sampling.split_train_test(docs, 0.0).collect()}
    assert all_train == {"train"}
    over = {r["split"] for r in sampling.split_train_test(docs, 1.5).collect()}
    assert over == {"test"}


def _sized_docs(spark):
    # doc i has (i % 7 + 1) tokens; 3 sources
    rows = [(i, f"src{i % 3}", "tok " * (i % 7 + 1)) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_budget_sample_crossing_doc_kept_and_cum_exact(spark):
    docs = _sized_docs(spark)
    out = sampling.budget_sample(docs, "source", budget_tokens=40)
    rows = out.collect()
    # recompute the ground truth driver-side: md5 order per group
    import hashlib

    truth = {}
    per_group = {}
    for r in docs.collect():
        per_group.setdefault(r["source"], []).append(r)
    for src, grp in per_group.items():
        grp.sort(key=lambda r: (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]))
        cum = 0
        for r in grp:
            n = len(r["text"].split())
            if cum < 40:  # budget floor: the crossing doc is kept
                truth[r["doc_id"]] = (src, n, cum + n)
            cum += n
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"]) for r in rows}
    assert got == truth


def test_budget_sample_invariant_to_bucketing_and_partitioning(spark):
    docs = _sized_docs(spark)
    base = sorted(map(tuple, sampling.budget_sample(docs, "source", 50).collect()))
    for variant in (
        sampling.budget_sample(docs.repartition(11), "source", 50),
        sampling.budget_sample(docs, "source", 50, bucket_chars=1),
        sampling.budget_sample(docs, "source", 50, bucket_chars=3),
    ):
        assert sorted(map(tuple, variant.collect())) == base


def test_rate_sample_rates_and_determinism(spark):
    rows = [(i, f"src{i % 4}") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 0.0, "src1": 0.25, "src2": 1.0}
    out = sampling.rate_sample(docs, "source", rates)
    got = out.groupBy("source").count().collect()
    sizes = {r["source"]: r["count"] for r in got}
    assert "src0" not in sizes                    # rate 0 drops all
    assert sizes["src2"] == 500                   # rate 1 keeps all
    assert sizes["src3"] == 500                   # default rate 1.0
    assert 80 <= sizes["src1"] <= 170             # ~25% of 500
    # deterministic across partitionings
    again = sampling.rate_sample(docs.repartition(7), "source", rates)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_rate_sample_is_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = (
        sampling.rate_sample(docs, "source", {"a": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
