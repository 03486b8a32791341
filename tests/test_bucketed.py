from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.sources.bucketed import (
    bucketed_join,
    n_exchanges,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    """Both sides bucketed+sorted on the join key with equal bucket counts:
    the SortMergeJoin must need NO shuffle (the 100 TB co-location story)."""
    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_buck_a", "k", n_buckets=8, path=str(tmp_path / "a"))
    write_bucketed(b, "t_buck_b", "k", n_buckets=8, path=str(tmp_path / "b"))
    try:
        j = bucketed_join(spark, "t_buck_a", "t_buck_b", "k")
        assert n_exchanges(j) == 0
        assert "SortMergeJoin" in j._jdf.queryExecution().executedPlan().toString()
        assert j.count() == 1500
        # correctness of the co-located join
        row = j.filter(F.col("k") == 7).collect()[0]
        assert row["va"] == 14 and row["vb"] == 21
    finally:
        spark.sql("DROP TABLE IF EXISTS t_buck_a")
        spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_unbucketed_join_does_exchange(spark, tmp_path, no_broadcast):
    """Control: the same join over plain parquet shuffles both sides."""
    a = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
    b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
    j = spark.read.parquet(str(tmp_path / "pa")).join(
        spark.read.parquet(str(tmp_path / "pb")), "k"
    )
    assert n_exchanges(j) >= 2
