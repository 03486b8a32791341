from __future__ import annotations

from document_extraction_spark.operators.dedup import dedup_clusters


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, island 7-8, singleton pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8), (10, 11)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    # a 12-node path exercises multi-round propagation (diameter > 1 round)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert set(out.values()) == {100}
    assert len(out) == 13


def test_cycle_and_cross_links(spark):
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5), (7, 2), (2, 9)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert set(out.values()) == {2}
