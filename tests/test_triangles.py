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
