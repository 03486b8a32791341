"""Int8 embedding quantization + integer-exact quantized top-k
(operators/quantization.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import quantization as QZ
from document_extraction_spark.operators.similarity import brute_force_topk


def test_codes_in_range_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.5, -0.3, 0.9]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in QZ.quantize_embeddings(df).collect()}
    codes = out[1]["codes"]
    assert all(-127 <= c <= 127 for c in codes)
    assert codes[3] == 127  # max-abs element maps to +/-127 exactly
    assert codes[2] < 0  # negative component keeps its sign
    assert out[2]["codes"] == [0, 0, 0, 0]  # zero vector -> zero codes
    assert out[2]["n2"] == 0
    again = {r["vec_id"]: r["codes"] for r in QZ.quantize_embeddings(df).collect()}
    assert again[1] == codes


def test_quantized_topk_shape_and_selfexclusion(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = QZ.quantized_topk(df, df.where("vec_id < 3"), k=5)
    pdf = out.toPandas()
    assert set(pdf["query_id"]) == {0, 1, 2}
    assert all(pdf["vec_id"] != pdf["query_id"])
    assert pdf.groupby("query_id")["rank"].max().eq(5).all()
    assert (pdf["score_e5"].abs() <= 100000).all()


def test_recall_vs_exact_on_testdata(spark, testdata_dir):
    path = os.path.join(testdata_dir, "sf0.01", "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip("embeddings testdata absent")
    emb = spark.read.parquet(path)
    queries = emb.where("vec_id < 5")
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    quant = QZ.quantized_topk(emb, queries, k=10).toPandas()
    recalls = []
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        q = set(quant[quant["query_id"] == qid]["vec_id"])
        recalls.append(len(e & q) / len(e))
    # symmetric int8 keeps most of the exact top-10 even on this
    # near-orthogonal corpus (affine min/max codes measured 0.42 here —
    # the DC component dominates; see the module docstring)
    assert sum(recalls) / len(recalls) >= 0.7, recalls
