"""Property tests: connected components vs a Python union-find, and
phrase search vs a naive per-doc scan, over randomized inputs.

Spark-backed hypothesis runs cost a job per example — small example
counts, tiny inputs; the value is shape coverage (self-loop-free random
graphs of varying density, docs with repeated/adjacent/absent terms),
not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from barks_ocr_spark.operators import clusters, index


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@st.composite
def _edge_lists(draw):
    n_nodes = draw(st.integers(2, 14))
    n_edges = draw(st.integers(1, 18))
    return [
        (draw(st.integers(0, n_nodes)), draw(st.integers(0, n_nodes)))
        for _ in range(n_edges)
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edge_lists())
def test_clusters_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]  # pairs never self-pair
    if not edges:
        return
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.duplicate_clusters(
            spark.createDataFrame(edges, "doc_a long, doc_b long")
        ).collect()
    }
    assert got == _uf_components(edges)


_WORDS = ["alpha", "beta", "gamma", "delta"]


def _naive_phrase_hits(docs, terms):
    out = {}
    for doc_id, text in docs:
        toks = text.split()
        n = sum(
            1
            for i in range(len(toks) - len(terms) + 1)
            if toks[i : i + len(terms)] == terms
        )
        if n:
            out[doc_id] = n
    return out


@st.composite
def _token_docs(draw):
    n_docs = draw(st.integers(1, 5))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10))
        docs.append((i, " ".join(toks)))
    k = draw(st.integers(1, 3))
    terms = [draw(st.sampled_from(_WORDS)) for _ in range(k)]
    return docs, terms


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_token_docs())
def test_phrase_matches_naive_scan(spark, case):
    docs, terms = case
    pos = index.positional_index(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in index.search_phrase(pos, " ".join(terms)).collect()
    }
    assert got == _naive_phrase_hits(docs, terms)
