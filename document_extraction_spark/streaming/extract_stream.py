"""Streaming extraction: the same vectorized kernel over a file-source
stream (reference comparison: the reference is strictly batch, one document
per process — /root/reference/main.py:74; here new transcript partitions
land continuously and are extracted incrementally with exactly-once file
sink semantics via the streaming checkpoint).

The batch and streaming plans share ``build_extract_df`` — one kernel, one
schema, two execution modes (Structured Streaming's incremental model makes
the per-turn statelessness requirement load-bearing: a stateless kernel is
trivially correct under micro-batch re-execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_extraction_spark.plans.extract_pipeline import build_extract_df

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcript_stream(spark: SparkSession, src_dir: str,
                           max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def extract_stream(sdf: DataFrame) -> DataFrame:
    """Streaming extraction plan (no repartition: micro-batch sizing already
    bounds task width; the kernel is per-row stateless so no state store)."""
    return build_extract_df(sdf)


def run_extract_stream(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    ckpt_dir: str,
    available_now: bool = True,
):
    """src parquet dir -> extracted parquet dir, exactly-once via streaming
    checkpoint. ``available_now`` drains what exists then stops (backfill /
    test mode); otherwise runs continuously."""
    out = extract_stream(read_transcript_stream(spark, src_dir))
    writer = (
        out.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(sdf: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-key dedup: drop re-deliveries of the same
    (conv_id, turn_idx) within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes, so the state store stays bounded at
    10^12-turn scale (a plain dropDuplicates would grow state forever).
    The upstream-retry / at-least-once-source companion to the file sink's
    exactly-once output semantics."""
    return sdf.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def turn_rate_by_window(sdf: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window turn metrics by role — late turns beyond
    the watermark are dropped deterministically (SURVEY.md §2.3 streaming
    row: watermark/window/late-data)."""
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text").cast("long")).alias("chars_in"),
        )
    )
