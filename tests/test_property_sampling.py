"""Property tests: the two-phase boundary-refinement selections
(budget_sample, cap_per_group) against a driver-side reference model
under randomized inputs.

The exact-truth unit tests pin one corpus; these pin the ALGEBRA — for
any group sizes, token counts, budget/cap, and bucket width, the
bucketed decomposition must select exactly the rows the naive
single-ordered-scan model selects. Spark-backed hypothesis runs are a
job per example, so example counts are small.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from barks_ocr_spark.operators import sampling

_rows = st.lists(
    st.tuples(
        st.integers(0, 60),          # doc_id
        # None: a NULL group is a real partition and must keep its
        # budget/cap (the bucket join is null-safe)
        st.sampled_from(["g0", "g1", "g2", None]),
        st.integers(0, 9),           # token count (0 allowed)
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _md5_order(rows):
    # cross-group order is irrelevant to the selection (budgets are per
    # group); sort NULL groups first for a total order
    return sorted(
        rows,
        key=lambda r: (
            r[1] is not None,
            r[1] or "",
            hashlib.md5(str(r[0]).encode()).hexdigest(),
            r[0],
        ),
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, budget=st.integers(1, 30), bucket_chars=st.integers(1, 3))
def test_budget_sample_matches_reference_model(spark, rows, budget, bucket_chars):
    df = spark.createDataFrame(
        [(i, g, "tok " * n) for i, g, n in rows],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in sampling.budget_sample(
            df, "source", budget, bucket_chars=bucket_chars
        ).collect()
    }
    want = {}
    cum_by_group: dict[str, int] = {}
    for i, g, n in _md5_order(rows):
        cum = cum_by_group.get(g, 0)
        if cum < budget:
            want[i] = (n, cum + n)
        cum_by_group[g] = cum + n
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, cap=st.integers(1, 12), bucket_chars=st.integers(1, 3))
def test_cap_per_group_matches_reference_model(spark, rows, cap, bucket_chars):
    df = spark.createDataFrame(
        [(i, g) for i, g, _ in rows], "doc_id long, source string"
    )
    got = sorted(
        (r["doc_id"], r["source"])
        for r in sampling.cap_per_group(
            df, "source", cap, bucket_chars=bucket_chars
        ).collect()
    )
    want = []
    seen: dict[str, int] = {}
    for i, g, _ in _md5_order(rows):
        if seen.get(g, 0) < cap:
            want.append((i, g))
            seen[g] = seen.get(g, 0) + 1
    assert got == sorted(want)


# ─── quantile_filter ─────────────────────────────────────────────────────

_qscores = st.lists(
    st.tuples(
        st.integers(0, 80),  # doc_id
        st.one_of(
            st.none(),                       # null score: excluded
            st.integers(0, 4),               # heavy ties
            st.floats(0, 1, allow_nan=False, width=32),
        ),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


def _quantile_model(rows, frac):
    scored = [(i, s) for i, s in rows if s is not None]
    k = int(len(scored) * frac + 1e-9)  # same decimal-floor nudge as the op
    ordered = sorted(
        scored,
        key=lambda r: (
            -r[1],
            hashlib.md5(str(r[0]).encode()).hexdigest(),
            r[0],
        ),
    )
    return {i for i, _ in ordered[:k]}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=_qscores,
    frac=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
    max_levels=st.sampled_from([0, 1, 4]),
)
def test_quantile_filter_matches_reference_model(spark, rows, frac, max_levels):
    """For any scores (ties, floats, nulls), keep fraction, and
    refinement depth — including max_levels=0, which forces the
    residual-sliver exit — the kept set equals the naive
    sort-everything model's top floor(n*frac) under
    (score DESC, md5(id), id)."""
    df = spark.createDataFrame(
        [(i, float(s) if s is not None else None) for i, s in rows],
        "doc_id long, score double",
    )
    got = {
        r["doc_id"]
        for r in sampling.quantile_filter(
            df, "score", frac, max_levels=max_levels, n_buckets=4
        ).collect()
    }
    assert got == _quantile_model(rows, frac)


def test_quantile_filter_deterministic_across_partitionings(spark):
    rows = [(i, float(i % 7)) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id long, score double")
    df8 = df1.repartition(8)
    a = {r["doc_id"] for r in sampling.quantile_filter(df1, "score", 0.3).collect()}
    b = {r["doc_id"] for r in sampling.quantile_filter(df8, "score", 0.3).collect()}
    assert a == b and len(a) == 60


def test_quantile_filter_all_ties_takes_no_sliver_window(spark):
    """An all-tied score column must exit through the single-value
    shortcut: the kept set is the md5-first k rows and the plan of the
    tied branch is cap_per_group's bucketed window (never an
    unpartitioned corpus-wide row_number)."""
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "doc_id long, score double"
    )
    out = sampling.quantile_filter(df, "score", 0.25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # cap_per_group windows carry the _qg/_bk partition keys; an
    # unpartitioned window spec would start with 'windowspecdefinition(score'
    assert "windowspecdefinition(score" not in plan
    assert {r["doc_id"] for r in out.collect()} == _quantile_model(
        [(i, 1.0) for i in range(100)], 0.25
    )
