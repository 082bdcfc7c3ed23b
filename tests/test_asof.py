"""Point-in-time join (operators/asof.py)."""

from __future__ import annotations

from barks_ocr_spark.operators import asof


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_semantics(spark):
    left = _df(
        spark,
        [(1, 10, 100), (1, 25, 101), (2, 5, 200), (3, 50, 300)],
        "user long, t long, event long",
    )
    right = _df(
        spark,
        [(1, 10, 900), (1, 20, 901), (1, 30, 902), (2, 6, 910)],
        "user long, t long, price long",
    )
    out = {
        r["event"]: r["asof_price"]
        for r in asof.asof_join(
            left, right, ["user"], "t", {"price": "asof_price"}
        ).collect()
    }
    assert out == {
        100: 900,  # equal timestamp matches (at-or-before)
        101: 901,  # newest ≤ 25 is t=20; t=30 ignored
        200: None,  # right exists only after the left row
        300: None,  # key has no right rows at all
    }


def test_asof_multiple_payload_columns(spark):
    left = _df(spark, [(1, 15, 7)], "user long, t long, event long")
    right = _df(
        spark, [(1, 10, 5, "v1"), (1, 12, 6, "v2")],
        "user long, t long, price long, tag string",
    )
    row = asof.asof_join(
        left, right, ["user"], "t", {"price": "p", "tag": "g"}
    ).collect()[0]
    assert (row["p"], row["g"]) == (6, "v2")


def test_asof_single_window_operator(spark):
    left = _df(spark, [(1, 15, 7)], "user long, t long, event long")
    right = _df(
        spark, [(1, 10, 5, "v1")], "user long, t long, price long, tag string"
    )
    plan = (
        asof.asof_join(left, right, ["user"], "t", {"price": "p", "tag": "g"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all payload last() calls share one Window (one sort), and the plan
    # must never degrade to a range nested-loop join
    assert plan.count("Window") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
