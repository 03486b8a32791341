"""Triangle counting (operators/graphrank.py triangle_counts)."""

from __future__ import annotations

from document_extraction_spark.operators.graphrank import doc_graph, triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "lo long, hi long"
    ).distinct()


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = dict(triangle_counts(_edges(spark, k4)).collect())
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_path_and_star_have_no_triangles(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    star = [(0, i) for i in range(1, 6)]
    assert triangle_counts(_edges(spark, path)).count() == 0
    assert triangle_counts(_edges(spark, star)).count() == 0


def test_single_triangle_plus_pendant(spark):
    g = [(1, 2), (2, 3), (1, 3), (3, 4)]
    out = dict(triangle_counts(_edges(spark, g)).collect())
    assert out == {1: 1, 2: 1, 3: 1}  # pendant node 4 absent


def test_doc_graph_is_symmetric_distinct(spark, testdata_dir):
    import os

    path = os.path.join(testdata_dir, "sf0.001", "documents.parquet")
    docs = spark.read.parquet(path)
    g = doc_graph(docs, k=3).toPandas()
    assert (g["lo"] < g["hi"]).all()
    assert len(g) == len(g.drop_duplicates())


def test_kcore_k4_survives_pendants_peel(spark):
    from document_extraction_spark.operators.graphrank import kcore

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pendants = [(0, 10), (10, 11), (3, 12)]
    out = dict(kcore(_edges(spark, k4 + pendants), k=3, rounds=3).collect())
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}  # pendant chain fully peeled


def test_kcore_fixpoint_on_bench_graph(spark, testdata_dir):
    """Round 5 must change nothing vs round 4 on the sf0.01 doc graph —
    the fixed-round oracle output IS the exact 3-core there."""
    import os

    from document_extraction_spark.operators.graphrank import doc_graph, kcore

    path = os.path.join(testdata_dir, "sf0.01", "documents.parquet")
    docs = spark.read.parquet(path)
    g = doc_graph(docs, k=3)
    r4 = sorted(map(tuple, kcore(g, k=3, rounds=4).collect()))
    r5 = sorted(map(tuple, kcore(g, k=3, rounds=5).collect()))
    assert r4 == r5 and len(r4) > 0
