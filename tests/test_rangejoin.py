"""Banded range join (operators/rangejoin.py)."""

from __future__ import annotations

from barks_ocr_spark.operators import rangejoin


def _run(spark, points, intervals, w):
    p = spark.createDataFrame(points, "pid long, x double")
    i = spark.createDataFrame(intervals, "tier string, lo double, hi double")
    out = rangejoin.banded_range_join(p, i, "x", "lo", "hi", w)
    return {(r["pid"], r["tier"]) for r in out.collect()}


def test_overlaps_boundaries_and_wide_intervals(spark):
    points = [(1, 0.0), (2, 5.0), (3, 9.99), (4, 10.0), (5, 77.0)]
    intervals = [
        ("a", 0.0, 10.0),   # half-open: x=10 excluded, x=0 included
        ("b", 5.0, 12.0),   # overlaps a
        ("wide", 0.0, 100.0),  # spans many bands — still exactly one match per point
    ]
    got = _run(spark, points, intervals, w=4.0)
    assert got == {
        (1, "a"), (1, "wide"),
        (2, "a"), (2, "b"), (2, "wide"),
        (3, "a"), (3, "b"), (3, "wide"),
        (4, "b"), (4, "wide"),          # 10.0 excluded from a (hi-open)
        (5, "wide"),
    }


def test_no_nested_loop_in_plan(spark):
    p = spark.createDataFrame([(1, 1.0)], "pid long, x double")
    i = spark.createDataFrame([("a", 0.0, 2.0)], "tier string, lo double, hi double")
    plan = (
        rangejoin.banded_range_join(p, i, "x", "lo", "hi", 1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_band_width_invariance(spark):
    points = [(i, float(i) * 1.7) for i in range(40)]
    intervals = [("t1", 3.0, 21.0), ("t2", 20.0, 20.5), ("t3", 50.0, 70.0)]
    a = _run(spark, points, intervals, w=1.0)
    b = _run(spark, points, intervals, w=7.0)
    c = _run(spark, points, intervals, w=100.0)
    assert a == b == c
