"""Bloom-filter runtime pruning (operators/bloom.py): no false negatives,
measured false-positive rate, linear merge, and word-table bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_extraction_spark.operators import bloom


def test_no_false_negatives_and_low_fp_rate(spark):
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bf = bloom.bloom_build(members, "k")
    probes = spark.range(0, 5000).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom.bloom_prefilter(probes, "k", bf).collect()}
    assert set(range(500)) <= passed  # every member passes
    fp = len(passed) - 500
    # m=16384, k=3, n=500 -> expected fp rate ~0.1%; allow generous slack
    assert fp <= 100, f"false positives {fp} out of 4500 negatives"


def test_word_table_bounded(spark):
    bf = bloom.bloom_build(
        spark.range(0, 10000).select(F.col("id").alias("k")), "k"
    )
    assert bf.count() <= bloom.M_BITS // 32
    # all masks are 32-bit lanes: no negative words, no bits above 2^32
    bad = bf.where((F.col("word") < 0) | (F.col("word") >= (1 << 32))).count()
    assert bad == 0


def test_merge_is_bitwise_union(spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    both = a.unionByName(b)
    merged = (
        bloom.bloom_build(a, "k")
        .unionByName(bloom.bloom_build(b, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    direct = bloom.bloom_build(both, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_prefilter_preserves_probe_schema(spark):
    members = spark.range(0, 10).select(F.col("id").alias("k"))
    probes = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    out = bloom.bloom_prefilter(probes, "k", bloom.bloom_build(members, "k"))
    assert out.columns == ["k", "payload"]
    kept = {r["k"]: r["payload"] for r in out.collect()}
    for k, v in kept.items():
        assert v == 2 * k


def test_duplicate_probe_keys_not_false_negatives(spark):
    """r5 ADVICE (high): summing per-(key,i) hits over duplicate probe rows
    gave member keys with multiplicity m a total of m*k, failing the == k
    test. Membership must be decided per DISTINCT key."""
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    bf = bloom.bloom_build(members, "k")
    # 200 probe rows over 100 member keys, each key twice
    probes = spark.range(0, 200).select((F.col("id") % 100).alias("k"))
    out = bloom.bloom_prefilter(probes, "k", bf)
    assert out.count() == 200  # every duplicate row survives
    assert out.select("k").distinct().count() == 100
