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
