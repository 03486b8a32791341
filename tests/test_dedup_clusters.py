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


def test_star_equals_propagation_on_lsh_pairs(spark, testdata_dir):
    """dedup_clusters_star (large-star/small-star, O(log n) rounds) must
    produce EXACTLY the labels of min-label propagation on the real
    pipeline's pair graph."""
    from document_extraction_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{testdata_dir}/sf0.01/documents.parquet")
    pairs = DD.near_dup_pairs_pipeline(docs, threshold=0.2).localCheckpoint()
    a = sorted(map(tuple, DD.dedup_clusters(pairs).collect()))
    b = sorted(map(tuple, DD.dedup_clusters_star(pairs).collect()))
    assert a == b and len(a) > 0


def test_star_handles_deep_chain_where_propagation_cannot(spark):
    """The selling point: a 120-node chain (transitive near-dups) has
    diameter 119 — min-label propagation trips its max_iters guard, star
    contraction converges in O(log n) rounds and labels the whole chain
    with its minimum."""
    import pytest

    from document_extraction_spark.operators import dedup as DD

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        DD.dedup_clusters(chain, max_iters=20)
    got = DD.dedup_clusters_star(chain, max_iters=20).collect()
    assert len(got) == 121
    assert all(r["cluster_id"] == 0 for r in got)


def test_star_mixed_topologies(spark):
    """Chains + triangles + isolated pairs in one graph, shuffled ids."""
    from document_extraction_spark.operators import dedup as DD

    edges = (
        [(900, 800), (800, 700)]          # chain, reversed order
        + [(5, 6), (6, 7), (5, 7)]         # triangle
        + [(41, 42)]                       # isolated pair
        + [(300, 301), (301, 300)]         # duplicate/reversed edges
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in DD.dedup_clusters_star(df).collect()}
    assert {got[900], got[800], got[700]} == {700}
    assert {got[5], got[6], got[7]} == {5}
    assert {got[41], got[42]} == {41}
    assert {got[300], got[301]} == {300}
    # parity with propagation on the same (shallow) graph
    prop = {r["doc_id"]: r["cluster_id"] for r in DD.dedup_clusters(df).collect()}
    assert prop == got


def test_cluster_representatives_elects_best_and_covers_all(spark):
    """KEEP verdict (r6): per cluster the highest-quality doc (min id on
    ties) is the representative; unpaired docs are their own singleton."""
    from pyspark.sql import functions as F

    from document_extraction_spark.operators.dedup import (
        cluster_representatives,
    )

    docs = spark.createDataFrame(
        [
            # cluster of 0/1/2: 1 has the richest text -> rep
            (0, "short words here"),
            (1, "a properly long sentence with many reasonable words, "
                "enough tokens to saturate the length heuristic and win "
                "the quality election over the short variants clearly, "
                "because forty tokens are needed for full saturation of "
                "the score used by the election."),
            (2, "short words here too"),
            # singleton
            (3, "completely separate content"),
            # null text: quality of '' (still covered, singleton)
            (4, None),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "doc_id long, cluster_id long"
    )
    out = {r["doc_id"]: r for r in
           cluster_representatives(docs, clusters).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[1]["is_rep"] and not out[0]["is_rep"] and not out[2]["is_rep"]
    assert all(out[i]["n_members"] == 3 for i in (0, 1, 2))
    for i in (3, 4):
        assert out[i]["is_rep"] and out[i]["cluster_id"] == i \
            and out[i]["n_members"] == 1
    # exactly one representative per cluster
    reps = (cluster_representatives(docs, clusters)
            .groupBy("cluster_id")
            .agg(F.sum(F.col("is_rep").cast("int")).alias("n"))
            .collect())
    assert all(r["n"] == 1 for r in reps)


def test_cluster_representatives_tie_breaks_min_id(spark):
    from document_extraction_spark.operators.dedup import (
        cluster_representatives,
    )

    docs = spark.createDataFrame(
        [(7, "same text twin"), (9, "same text twin")],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(7, 7), (9, 7)], "doc_id long, cluster_id long"
    )
    out = {r["doc_id"]: r["is_rep"]
           for r in cluster_representatives(docs, clusters).collect()}
    assert out == {7: True, 9: False}
