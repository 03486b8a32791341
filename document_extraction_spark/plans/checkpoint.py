"""Checkpointed, resumable extraction runs (north-star requirement:
"per-partition lineage and extraction metrics … enabling idempotent resume at
10^12-turn scale"; FIXTURES.md §3).

Unit of commit: a **bucket** = ``pmod(xxhash64(conv_id), n_buckets)``. The
run processes pending buckets in waves; each wave

1. filters the source to its buckets (predicate → partition/row-group prune),
2. extracts via the mapInPandas kernel,
3. writes ``partitionBy(bucket)`` with **dynamic partition overwrite** — a
   re-run of a half-written bucket replaces it instead of duplicating it,
4. appends one manifest row per bucket (with lineage metrics) to the
   checkpoint table — only after the data write succeeded.

Resume = ``left_anti`` join of the bucket universe against the manifest
(broadcast — the manifest has at most ``n_buckets`` rows, SURVEY.md §2.3
"Joins"). A crash between (3) and (4) is safe: the bucket is re-extracted and
dynamically overwritten. A completed run resumes as a no-op.

On Iceberg the same protocol maps to snapshot-atomic ``writeTo().append()``
plus a metadata table; the parquet layout here emulates that without the
runtime jar (SURVEY.md §7 "Iceberg absence").
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_extraction_spark.plans.extract_pipeline import build_extract_df

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_parse_failed", T.LongType()),
        T.StructField("n_blocks_kept", T.LongType()),
        T.StructField("n_blocks_dropped", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def read_manifest(spark: SparkSession, ckpt_path: str) -> DataFrame:
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(ckpt_path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def pending_buckets(spark: SparkSession, ckpt_path: str, n_buckets: int) -> list[int]:
    """Bucket universe anti-joined against committed manifest rows."""
    universe = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    done = read_manifest(spark, ckpt_path).select("bucket")
    rows = universe.join(F.broadcast(done), "bucket", "left_anti").collect()
    return sorted(r["bucket"] for r in rows)


def run_resumable(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    ckpt_path: str,
    run_id: str,
    n_buckets: int = 16,
    wave_size: int = 8,
    partitions_per_wave: int | None = None,
    max_waves: int | None = None,
) -> list[int]:
    """Process pending buckets in waves; returns buckets committed this call.

    ``max_waves`` exists for tests (simulated crash between waves).
    """
    man = read_manifest(spark, ckpt_path)
    prior = [r["n_buckets"] for r in man.select("n_buckets").distinct().collect()]
    if prior and prior != [n_buckets]:
        raise ValueError(
            f"checkpoint at {ckpt_path} was created with n_buckets={prior}; "
            f"resuming with n_buckets={n_buckets} would corrupt bucketing — "
            "use the original value or a fresh checkpoint path"
        )
    pend = pending_buckets(spark, ckpt_path, n_buckets)
    committed: list[int] = []
    waves = [pend[i : i + wave_size] for i in range(0, len(pend), wave_size)]
    if max_waves is not None:
        waves = waves[:max_waves]

    src = spark.read.parquet(src_path).withColumn("bucket", bucket_col(n_buckets))
    for wave in waves:
        wave_df = src.filter(F.col("bucket").isin(wave))
        extracted = build_extract_df(
            wave_df.drop("bucket"), partitions=partitions_per_wave
        ).withColumn("bucket", bucket_col(n_buckets))
        (
            extracted.sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            # pinned on the writer: relying on the session conf would wipe
            # previously committed buckets under the default static mode
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(dst_path)
        )  # dynamic mode: only buckets present in this wave are replaced

        try:
            written = spark.read.parquet(dst_path)
        except Exception:
            # a wave whose buckets were all empty leaves no data files yet
            written = None
        stats = (
            written.filter(F.col("bucket").isin(wave))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.sum(F.col("parse_failed").cast("long")).alias("n_parse_failed"),
                F.sum("n_blocks_kept").alias("n_blocks_kept"),
                F.sum("n_blocks_dropped").alias("n_blocks_dropped"),
                F.sum("bytes_in").alias("bytes_in"),
                F.sum("bytes_out").alias("bytes_out"),
            )
            .collect()
        ) if written is not None else []
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        by_bucket = {r["bucket"]: r for r in stats}
        manifest_rows = [
            (
                run_id,
                n_buckets,
                b,
                by_bucket[b]["n_turns"] if b in by_bucket else 0,
                by_bucket[b]["n_parse_failed"] if b in by_bucket else 0,
                by_bucket[b]["n_blocks_kept"] if b in by_bucket else 0,
                by_bucket[b]["n_blocks_dropped"] if b in by_bucket else 0,
                by_bucket[b]["bytes_in"] if b in by_bucket else 0,
                by_bucket[b]["bytes_out"] if b in by_bucket else 0,
                now,
            )
            for b in wave  # empty buckets commit too (they are "done")
        ]
        spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(ckpt_path)
        committed.extend(wave)
    return committed
