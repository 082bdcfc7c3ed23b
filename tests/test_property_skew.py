"""Property tests: skew-module round trips under randomized inputs.

Spark-backed hypothesis runs are expensive (a job per example), so the
example counts are small and the inputs tiny — the value is the shape
coverage (empty docs, single-span docs, page_size ≥ doc length, unicode
text, None text/media_ref), not volume.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from barks_ocr_spark.operators import skew
from barks_ocr_spark.schemas import DOCUMENTS_SPANS_SCHEMA

_text = st.text(alphabet="aZ 真.’—", max_size=8)


@st.composite
def _span_docs(draw):
    n = draw(st.integers(1, 5))
    docs = []
    for i in range(n):
        m = draw(st.integers(0, 7))
        spans = []
        for j in range(m):
            if draw(st.booleans()):
                spans.append({"kind": "text", "text": draw(_text), "media_ref": "", "offset": j})
            else:
                spans.append({"kind": "media", "text": None, "media_ref": draw(_text), "offset": j})
        docs.append((f"d{i}", spans))
    return docs


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_span_docs(), page_size=st.integers(1, 6))
def test_paginate_assemble_round_trip_property(spark, docs, page_size):
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SPANS_SCHEMA)
    back = skew.assemble_book_spans(skew.paginate_spans(df, page_size))
    want = {d: [tuple(s.values()) for s in spans] for d, spans in docs}
    got = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in back.collect()}
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["k0", "k1", "hot"])),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    buckets=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join_property(spark, rows, buckets, how):
    facts = spark.createDataFrame(rows or [(0, "k0")], "fact_id long, k string")
    dim = spark.createDataFrame([("k0", 1), ("hot", 2)], "k string, v int")
    plain = facts.join(dim, "k", how).select("fact_id", "k", "v")
    salted = skew.salted_join(
        facts, dim, on="k", salt_src="fact_id", buckets=buckets, how=how
    ).select("fact_id", "k", "v")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
