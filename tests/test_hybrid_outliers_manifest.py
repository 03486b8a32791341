"""RRF hybrid retrieval, rank-exact MAD outliers, manifest file pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from document_extraction_spark.operators import manifest as MAN
from document_extraction_spark.operators import outliers as OUT
from document_extraction_spark.operators.hybrid_search import rrf_fuse


# ---------------------------------------------------------------- RRF fusion

def test_rrf_math_and_missing_leg(spark):
    sparse = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    dense = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse(sparse, dense).collect()}
    # doc 2: both legs -> 10^6//62 + 10^6//61
    assert out[2]["rrf_micro"] == 1_000_000 // 62 + 1_000_000 // 61
    assert out[1]["rrf_micro"] == 1_000_000 // 61  # sparse only
    assert out[3]["rrf_micro"] == 1_000_000 // 62  # dense only
    assert out[1]["dense_rank"] is None and out[3]["sparse_rank"] is None
    # both-leg doc dominates single-leg docs
    assert out[2]["rrf_micro"] > max(out[1]["rrf_micro"], out[3]["rrf_micro"])


def test_rrf_ordering_ties_broken_by_id(spark):
    sparse = spark.createDataFrame([(5, 1), (4, 1)], "doc_id long, rank int")
    rows = rrf_fuse(sparse, sparse.limit(0), top=2).collect()
    assert [r["doc_id"] for r in rows] == [4, 5]


# ------------------------------------------------------------- MAD outliers

def test_outliers_flags_only_the_spike(spark):
    rows = [(i, "a", 10.0 + (i % 3)) for i in range(20)] + [(99, "a", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, key string, value double")
    got = OUT.robust_outliers(df, "key", "value", "event_id").collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["med"] in (10.0, 11.0, 12.0) and got[0]["mad"] >= 0.0


def test_outliers_lower_median_exact(spark):
    # even n: lower median = element at rank n//2... (n+1) div 2 = 2 of [1,2,3,4]
    df = spark.createDataFrame(
        [(i, "k", float(v)) for i, v in enumerate([1, 2, 3, 4])],
        "event_id long, key string, value double",
    )
    med = OUT._lower_median(df, "key", F.col("value"), "event_id", "med").collect()
    assert med[0]["med"] == 2.0


def test_outliers_zero_mad_group(spark):
    # >half identical -> mad 0 -> any deviation flagged
    rows = [(i, "k", 7.0) for i in range(10)] + [(42, "k", 7.5)]
    df = spark.createDataFrame(rows, "event_id long, key string, value double")
    got = OUT.robust_outliers(df, "key", "value", "event_id").collect()
    assert [r["event_id"] for r in got] == [42]


# ---------------------------------------------------------- manifest pruning

def test_manifest_prune_correct_and_skips_files(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        (
            spark.range(0, 10000)
            .select(F.col("id"), (F.col("id") % 97).alias("v"))
            .repartitionByRange(16, "id")
            .sortWithinPartitions("id")
            .write.parquet(path)
        )
        man = MAN.build_manifest(spark, path, ["id"])
        assert man.count() == 16
        files = MAN.pruned_files(man, "id", 2000, 2999)
        assert 0 < len(files) < 16  # skipped most files
        pruned = MAN.pruned_read(spark, path, man, "id", 2000, 2999)
        full = (
            spark.read.parquet(path)
            .where(F.col("id").between(2000, 2999))
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, full.collect())
        )


def test_manifest_empty_range(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        spark.range(0, 100).write.parquet(path)
        man = MAN.build_manifest(spark, path, ["id"])
        out = MAN.pruned_read(spark, path, man, "id", 1000, 2000)
        assert out.count() == 0
