"""Bucketed tables: co-located joins plan without an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from barks_ocr_spark.sources import bucketed


def _tables(spark, suffix):
    a = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("va")
    )
    b = spark.range(0, 500).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 2).alias("vb")
    )
    bucketed.write_bucketed(a, f"bk_a_{suffix}", "k", num_buckets=8, sort_col="k")
    bucketed.write_bucketed(b, f"bk_b_{suffix}", "k", num_buckets=8, sort_col="k")
    return (
        bucketed.read_table(spark, f"bk_a_{suffix}"),
        bucketed.read_table(spark, f"bk_b_{suffix}"),
    )


def test_bucketed_join_is_exchange_free(spark):
    ta, tb = _tables(spark, "xfree")
    joined = ta.join(tb, "k")
    # disable broadcast so the join exercises the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        n = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert n == 1000 * 500 // 50  # 20 a-rows x 10 b-rows per key x 50 keys


def test_bucketed_join_matches_plain_join(spark):
    ta, tb = _tables(spark, "parity")
    plain_a = ta.repartition(4)  # strip the bucketing spec
    got = sorted(map(tuple, ta.join(tb, "k").collect()))
    want = sorted(map(tuple, plain_a.join(tb, "k").collect()))
    assert got == want


def test_bucketed_groupby_is_exchange_free(spark):
    ta, _ = _tables(spark, "agg")
    plan = (
        ta.groupBy("k")
        .agg(F.sum("va").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_orphan_sweep_scopes_by_pid_liveness(tmp_path, monkeypatch):
    """ADVICE r3: concurrent runs keep distinct pid-scoped tables; only
    dirs owned by DEAD pids are swept."""
    import os

    from barks_ocr_spark.sources import bucketed

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_DIR", str(tmp_path))
    dead = tmp_path / "bk_t_sf0_01_p4194000"  # beyond pid_max default
    live = tmp_path / "bk_t_sf0_01_p1"  # init — always alive
    mine = tmp_path / f"bk_t_sf0_01_p{os.getpid()}"
    other_base = tmp_path / "bk_other_sf0_01_p4194001"
    for d in (dead, live, mine, other_base):
        d.mkdir()
    bucketed.sweep_orphans("bk_t_sf0_01")
    assert not dead.exists()
    assert live.exists()
    assert mine.exists()
    assert other_base.exists()  # different base untouched
    assert bucketed.session_table("bk_t_sf0_01").endswith(f"_p{os.getpid()}")
