"""Randomized differentials for the analytics operators: banded range
join vs a naive double loop, sessionization vs a naive linear scan,
KMV vs a Python reference — small inputs, shape coverage over volume."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from barks_ocr_spark.operators import rangejoin, sketches


def test_range_join_matches_double_loop(spark):
    rng = random.Random(11)
    for trial in range(4):
        points = [(i, round(rng.uniform(-30, 130), 2)) for i in range(25)]
        intervals = []
        for j in range(8):
            lo = round(rng.uniform(-40, 120), 2)
            intervals.append((f"t{j}", lo, round(lo + rng.uniform(0, 60), 2)))
        w = rng.choice([0.5, 3.0, 17.0, 200.0])
        want = {
            (pid, t)
            for pid, x in points
            for t, lo, hi in intervals
            if lo <= x < hi
        }
        p = spark.createDataFrame(points, "pid long, x double")
        i = spark.createDataFrame(intervals, "tier string, lo double, hi double")
        got = {
            (r["pid"], r["tier"])
            for r in rangejoin.banded_range_join(p, i, "x", "lo", "hi", w).collect()
        }
        assert got == want, f"trial {trial} w={w}"


def _sessions_naive(events, gap):
    # events: [(user, us, eid)] → {(user, seq): (n, first, last)}
    out = {}
    by_user: dict = {}
    for u, us, eid in sorted(events, key=lambda t: (t[0], t[1], t[2])):
        by_user.setdefault(u, []).append((us, eid))
    for u, evs in by_user.items():
        seq, n, first, last, prev = 0, 0, None, None, None
        for us, eid in evs:
            if n == 0 or us - prev > gap:
                if n:
                    out[(u, seq)] = (n, first, last)
                seq, n, first, last = seq + 1, 1, eid, eid
            else:
                n += 1
                last = eid
            prev = us
        if n:
            out[(u, seq)] = (n, first, last)
    return out


def test_batch_sessions_match_naive(spark):
    rng = random.Random(5)
    gap = 1_800_000_000
    events = []
    eid = 0
    for u in range(1, 4):
        t = 0
        for _ in range(rng.randint(1, 25)):
            t += rng.choice([60, 600, 1200, 1900, 4000]) * 1_000_000
            events.append((u, t, eid))
            eid += 1
    want = _sessions_naive(events, gap)
    # replicate q_event_sessions' window logic over a (user, us, eid) frame
    from pyspark.sql.window import Window

    df = spark.createDataFrame(events, "user_id long, us long, event_id long")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = F.col("us") - F.lag("us").over(w)
    new = F.when(g.isNull() | (g > gap), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = df.withColumn("seq", F.sum(new).over(run))
    got = {
        (r["user_id"], r["seq"]): (r["n"], r["f"], r["l"])
        for r in sess.groupBy("user_id", "seq")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("f"),
            F.max("event_id").alias("l"),
        )
        .collect()
    }
    assert got == want


def test_kmv_matches_python_reference(spark):
    vals = [f"u{i}" for i in range(300)] * 2  # duplicates must not matter
    k = 16
    hashes = sorted(
        {int(hashlib.md5(v.encode()).hexdigest()[:8], 16) for v in vals}
    )[:k]
    want = round((k - 1) / (hashes[-1] / 4294967296.0), 6)
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = sketches.kmv_distinct(df, "g", "v", k=k).collect()[0]["est_distinct"]
    assert got == want
