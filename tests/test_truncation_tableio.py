from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.core.extract import extract_one
from document_extraction_spark.plans.extract_pipeline import build_extract_df
from document_extraction_spark.sources.tableio import TableIO, iceberg_available


def test_oversized_payload_truncation(spark):
    rows = [
        ("c", 0, "short plain text"),
        ("c", 1, "x" * 5000),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"]).select(
        "conv_id", "turn_idx", F.lit("user").alias("role"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"), "text",
    )
    out = {r["turn_idx"]: r for r in build_extract_df(df, max_payload_chars=1000).collect()}
    assert out[0]["truncated"] is False
    assert out[0]["text"] == "short plain text"
    assert out[1]["truncated"] is True
    # truncation happens BEFORE extraction: result == oracle of the capped payload
    assert out[1]["text"] == extract_one("x" * 1000)["text"]
    assert out[1]["bytes_in"] == 1000  # metrics reflect processed bytes

    # default: no cap, equality with uncapped oracle preserved
    out2 = {r["turn_idx"]: r for r in build_extract_df(df).collect()}
    assert out2[1]["truncated"] is False
    assert out2[1]["text"] == extract_one("x" * 5000)["text"]


def test_tableio_parquet_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    df = spark.range(5).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("bucket")
    )
    assert not io.exists("t1")
    io.append(df, "t1", ["bucket"])
    assert io.exists("t1")
    assert io.read("t1").count() == 5
    io.append(df, "t1", ["bucket"])
    assert io.read("t1").count() == 10

    # dynamic partition overwrite replaces only touched partitions
    io2 = TableIO(spark, str(tmp_path))
    part = spark.range(100, 103).select(
        F.col("id"), F.lit(0).cast("int").alias("bucket")
    )
    io2.overwrite_partitions(part, "t1", ["bucket"])
    left = io2.read("t1")
    assert left.filter(F.col("bucket") == 0).count() == 3      # replaced
    assert left.filter(F.col("bucket") == 1).count() == 4      # untouched
    # second overwrite of the same partition is idempotent
    io2.overwrite_partitions(part, "t1", ["bucket"])
    assert io2.read("t1").count() == 7


def test_tableio_iceberg_guard(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg on classpath here")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        TableIO(spark, str(tmp_path), catalog="lake")
