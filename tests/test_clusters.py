"""Connected components over dup pairs (operators/clusters.py)."""

from __future__ import annotations

import pytest

from barks_ocr_spark.operators import clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_and_island(spark):
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.duplicate_clusters(
            _pairs(spark, [(1, 2), (2, 3), (7, 8)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_long_path_converges(spark):
    # a 12-node path: worst diameter shape for min-label propagation
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.duplicate_clusters(
            _pairs(spark, [(i, i + 1) for i in range(1, 12)])
        ).collect()
    }
    assert out == {i: 1 for i in range(1, 13)}


def test_label_flows_against_edge_direction(spark):
    # min id sits at the "dst" end: propagation must be symmetric
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.duplicate_clusters(_pairs(spark, [(5, 4), (4, 9)])).collect()
    }
    assert out == {4: 4, 5: 4, 9: 4}


def test_deterministic_across_partitionings(spark):
    edges = [(i, i + 100) for i in range(20)] + [(3, 7), (107, 115)]
    a = sorted(
        map(tuple, clusters.duplicate_clusters(_pairs(spark, edges)).collect())
    )
    b = sorted(
        map(
            tuple,
            clusters.duplicate_clusters(
                _pairs(spark, edges).repartition(7)
            ).collect(),
        )
    )
    assert a == b


def test_max_rounds_raises(spark):
    with pytest.raises(RuntimeError):
        clusters.duplicate_clusters(
            _pairs(spark, [(i, i + 1) for i in range(1, 8)]), max_rounds=2
        )


def test_canonical_docs(spark):
    cl = clusters.duplicate_clusters(_pairs(spark, [(1, 2), (2, 3), (7, 8)]))
    sizes = {
        r["cluster_id"]: r["n_members"]
        for r in clusters.canonical_docs(cl).collect()
    }
    assert sizes == {1: 3, 7: 2}


def test_reliable_checkpoint_path(spark, tmp_path):
    """VERDICT r3 item 6: with checkpoint_dir set, rounds use reliable
    checkpoint() files (survive executor loss on a real cluster) and
    the result is identical to the localCheckpoint default."""
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    ckdir = str(tmp_path / "ck")
    got = sorted(
        map(
            tuple,
            clusters.duplicate_clusters(
                _pairs(spark, edges), checkpoint_dir=ckdir
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, clusters.duplicate_clusters(_pairs(spark, edges)).collect())
    )
    assert got == want
    # the reliable path actually wrote RDD checkpoint files
    import os

    found = []
    for root, _, files in os.walk(ckdir):
        found.extend(files)
    assert found, "no reliable checkpoint files written"
