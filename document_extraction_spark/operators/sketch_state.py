"""Persisted sketch state: HLL distinct-count sketches as a table, appended
per job run and merged on read — incremental corpus profiling.

This is what the mergeable sketches exist for at 100 TB: each ingest run
appends ONE small row per group (the sketch binary, a few KB), and "how many
distinct X so far, across every run" is a union-agg over the stats table —
never a re-scan of the corpus. The stats table grows with runs × groups, not
with data.

Plan shape:

* per-run sketch build: one groupBy over the run's slice — the same shuffle
  the run's own aggregation already pays; the appended output is tiny.
* merged read: scan of the (tiny) stats table + hll_union_agg per group.
  Estimates are exact in DataSketches' low-cardinality list/set mode and
  within the configured lgK error (default ~1.6% rsd at lgConfigK=12) above.

Sketch binaries travel through parquet as plain BINARY columns — no
serialization shim; ``hll_union_agg`` consumes them as written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.sources.tableio import TableIO


def append_distinct_sketches(
    io: TableIO,
    df: DataFrame,
    table: str,
    group_cols: list[str],
    value_col: str,
    run_id: str,
    lg_config_k: int = 12,
) -> None:
    """Sketch ``value_col``'s distinct values per ``group_cols`` over this
    run's slice and APPEND one row per group to the stats table:
    (group..., run_id, n_rows, sk)."""
    sk = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_config_k)).alias(
            "sk"
        ),
    ).withColumn("run_id", F.lit(run_id))
    io.append(sk, table)


def merged_distinct_estimates(
    io: TableIO, table: str, group_cols: list[str]
) -> DataFrame:
    """(group..., n_runs, n_rows, distinct_est) across every appended run:
    sketch union per group — the cross-run distinct count with no re-scan.
    Rows seen by several runs count once (the sketch property)."""
    return (
        io.read(table)
        .groupBy(*group_cols)
        .agg(
            F.countDistinct("run_id").cast("long").alias("n_runs"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("distinct_est"),
        )
    )
