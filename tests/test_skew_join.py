from __future__ import annotations

from pyspark.sql import functions as F

from document_extraction_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavy-hitter key: one key owns 80% of the big side
    big = spark.createDataFrame(
        [("hot", i) for i in range(800)] + [(f"k{i}", i) for i in range(200)],
        ["key", "val"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], ["key", "tag"]
    )
    plain = {(r["key"], r["val"], r["tag"]) for r in big.join(small, "key").collect()}
    salted = {
        (r["key"], r["val"], r["tag"])
        for r in salted_join(big, small, "key", factor=8).collect()
    }
    assert salted == plain
    assert len(salted) == 800 + 2


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([("hot", i) for i in range(1000)], ["key", "val"])
    small = spark.createDataFrame([("hot", "H")], ["key", "tag"])
    j = salted_join(big, small, "key", factor=8)
    # the salt column spreads the hot key across multiple join partitions;
    # result must still be exactly the 1000 matches
    assert j.count() == 1000
