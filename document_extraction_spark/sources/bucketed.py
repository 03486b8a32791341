"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (e.g. turns x per-conv
metadata, lineitem x orders) is the exchange of both sides on the join key.
Writing both tables bucketed (and sorted) by that key with the same bucket
count lets Spark plan a SortMergeJoin with NO Exchange on either side — the
bucket files are already key-partitioned on disk, so a join that would
shuffle 100 TB reads co-located buckets instead. This is the batch analogue
of co-partitioned Kafka topics / Iceberg bucket partition transforms.

``write_bucketed`` uses ``bucketBy + sortBy + saveAsTable`` (Spark only
honors bucket metadata through the catalog; a plain parquet path write
cannot carry it). Pass ``path`` to keep the data external (tests write to a
tmp dir). Verified by tests/test_bucketed.py: the joined plan contains zero
Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    keys = [key] if isinstance(key, str) else key
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    keys = [key] if isinstance(key, str) else key
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange nodes in the executed plan (plan audit helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
