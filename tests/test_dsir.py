"""DSIR importance weights (operators/dsir.py): target-like documents must
score higher than off-target ones, short documents drop out, and the
weight is an exact decimal sum (stable across partitionings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_extraction_spark.operators.dsir import dsir_log_weights

DOCS = [
    # target flavor: astronomy-ish bigrams
    (0, "stars orbit the galaxy core while planets orbit the stars", "wiki"),
    (1, "the galaxy spins and stars orbit the bright core", "wiki"),
    # raw-only flavor: spam-ish bigrams
    (2, "buy cheap pills buy cheap watches buy cheap pills now", "crawl"),
    (3, "cheap pills cheap watches best prices buy now", "crawl"),
    # raw doc that LOOKS like the target
    (4, "planets orbit the galaxy and stars orbit the core", "crawl"),
    # too short for a bigram
    (5, "hello", "crawl"),
    (6, None, "crawl"),
]


def test_target_like_docs_score_higher(spark):
    raw = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    target = raw.where(F.col("source") == "wiki")
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target).collect()}
    # the target-like crawl doc beats both spam docs
    assert w[4] > w[2] and w[4] > w[3]
    # short/null docs carry no features and are absent
    assert 5 not in w and 6 not in w


def test_weight_stable_across_partitionings(spark):
    raw = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    target = raw.where(F.col("source") == "wiki")
    a = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target).collect()}
    b = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw.repartition(7, "doc_id"),
                                   target.repartition(3)).collect()}
    assert a == b  # exact-decimal sums: order-independent to the bit
