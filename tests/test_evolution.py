"""Schema-evolution-safe reads (sources/evolution.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_extraction_spark.sources.evolution import read_evolved


def test_added_column_defaults_for_old_batches(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(3, "c", 1.5), (4, "d", None)], "id long, s string, v double"
    ).write.mode("append").parquet(path)
    out = {r["id"]: r for r in
           read_evolved(spark, path, {"v": 0.0}).collect()}
    assert out[1]["v"] == 0.0 and out[2]["v"] == 0.0  # pre-evolution rows
    assert out[3]["v"] == 1.5
    assert out[4]["v"] == 0.0  # explicit NULL also coalesced


def test_column_absent_everywhere_gets_literal(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.range(3).write.parquet(path)
    out = read_evolved(spark, path, {"flag": False}).collect()
    assert all(r["flag"] is False for r in out)


def test_no_defaults_is_plain_merge(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    spark.createDataFrame([(1,)], "id long").write.mode("append").parquet(path)
    spark.createDataFrame([(2, "x")], "id long, s string").write.mode(
        "append"
    ).parquet(path)
    df = read_evolved(spark, path, {})
    assert set(df.columns) == {"id", "s"}
    assert df.count() == 2
