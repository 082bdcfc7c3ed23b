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


def test_asof_null_payload_is_atomic(spark):
    """ADVICE r3 (medium): a matched right row whose payload value is
    NULL must yield NULL — not an older row's value — and all payload
    columns must come from the SAME right row."""
    left = _df(spark, [(1, 15, 7)], "user long, t long, event long")
    # newest at-or-before row (t=12) has price NULL but tag 'v2'; the old
    # per-column last(ignorenulls) carried price=5 from t=10 — mixing rows
    right = _df(
        spark, [(1, 10, 5, "v1"), (1, 12, None, "v2")],
        "user long, t long, price long, tag string",
    )
    row = asof.asof_join(
        left, right, ["user"], "t", {"price": "p", "tag": "g"}
    ).collect()[0]
    assert (row["p"], row["g"]) == (None, "v2")


def test_asof_null_right_ts_is_no_match(spark):
    """ADVICE r3 (low): right rows with NULL ts can never be 'at or
    before' anything — DuckDB ASOF / merge_asof parity."""
    left = _df(spark, [(1, 15, 7)], "user long, t long, event long")
    right = _df(
        spark, [(1, None, 5)], "user long, t long, price long"
    )
    row = asof.asof_join(left, right, ["user"], "t", {"price": "p"}).collect()[0]
    assert row["p"] is None


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


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential: the union-window as-of equals
    pandas.merge_asof(direction='backward', allow_exact_matches=True)
    over many shapes (keys without right rows, ties at equal ts,
    interleaved histories). Right rows are unique per (key, ts) — the
    operator's documented precondition."""
    import random

    import pandas as pd

    rng = random.Random(7)
    for trial in range(8):
        left = [
            (rng.randint(1, 4), rng.randint(0, 40), 100 * trial + i)
            for i in range(rng.randint(1, 12))
        ]
        seen = set()
        right = []
        for j in range(rng.randint(0, 12)):
            k = (rng.randint(1, 4), rng.randint(0, 40))
            if k not in seen:
                seen.add(k)
                right.append((k[0], k[1], 1000 * trial + j))
        ldf = spark.createDataFrame(left, "user long, t long, event long")
        rdf = spark.createDataFrame(
            right or [(99, 0, 0)], "user long, t long, price long"
        )
        got = {
            r["event"]: r["p"]
            for r in asof.asof_join(ldf, rdf, ["user"], "t", {"price": "p"}).collect()
        }
        lp = pd.DataFrame(left, columns=["user", "t", "event"]).sort_values("t")
        rp = pd.DataFrame(
            right or [(99, 0, 0)], columns=["user", "t", "price"]
        ).sort_values("t")
        want_df = pd.merge_asof(
            lp, rp, on="t", by="user", direction="backward", allow_exact_matches=True
        )
        want = {
            int(r.event): (None if pd.isna(r.price) else int(r.price))
            for r in want_df.itertuples()
        }
        assert got == want, f"trial {trial}: {got} != {want}"
