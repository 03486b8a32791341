"""The extraction pipeline as one lazy DataFrame plan (SURVEY.md §3.4).

``read -> (left_anti vs checkpoint) -> salted repartition -> mapInPandas ->
write + metrics`` — the distributed analogue of the reference's eager
per-document loop (/root/reference/main.py:74 -> extractor.py:40-74).

Scale notes (100 TB / 10^12 turns):

* Extraction is **per-turn stateless**, so rows of one conversation need NOT
  be co-located — we repartition on ``xxhash64(conv_id, turn_idx, salt)``
  which balances perfectly even when one conversation has 10^6 turns. The
  output *ordering metadata* (turn_idx) carries the stable turn ordering.
* Column pruning: only (keys + text) flow into the Python worker; Catalyst
  prunes the parquet scan to the read schema.
* Predicate pushdown: any turn/page selection is a plain ``filter`` that
  reaches the scan (the reference rasterizes everything then drops pages —
  extractor.py:57-60 — we never materialize-then-drop).
* The JVM->Python hop is Arrow record batches (bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), amortized per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_extraction_spark.core.extract import (
    extract_map_in_pandas,
    make_extract_kernel,
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

KEY_FIELDS = [
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
]

RESULT_FIELDS = [
    T.StructField("payload_kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
    T.StructField("n_blocks_kept", T.LongType()),
    T.StructField("n_blocks_dropped", T.LongType()),
    T.StructField("parse_failed", T.BooleanType()),
    T.StructField("truncated", T.BooleanType()),
    T.StructField("bytes_in", T.LongType()),
    T.StructField("bytes_out", T.LongType()),
]

OUT_SCHEMA = T.StructType(KEY_FIELDS + RESULT_FIELDS)

# the Python kernel emits spans as primitive offset arrays (fast Arrow path);
# the struct view above is assembled JVM-side in build_extract_df
KERNEL_FIELDS = [
    T.StructField("payload_kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("span_starts", T.ArrayType(T.IntegerType())),
    T.StructField("span_ends", T.ArrayType(T.IntegerType())),
    T.StructField("n_blocks_kept", T.LongType()),
    T.StructField("n_blocks_dropped", T.LongType()),
    T.StructField("parse_failed", T.BooleanType()),
    T.StructField("truncated", T.BooleanType()),
    T.StructField("bytes_in", T.LongType()),
    T.StructField("bytes_out", T.LongType()),
]

KERNEL_SCHEMA = T.StructType(KEY_FIELDS + KERNEL_FIELDS)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def build_extract_df(
    df: DataFrame,
    partitions: int | None = None,
    salt: int = 0,
    turn_filter=None,
    max_payload_chars: int | None = None,
) -> DataFrame:
    """Build the lazy extraction plan over a transcripts DataFrame.

    ``turn_filter`` (a Column predicate, e.g. ``F.col("turn_idx") < 5``) is
    applied *before* the scan-adjacent select so Catalyst pushes it into the
    source — the engine's version of the reference's ``--pages`` subset
    (main.py:54-63) without the rasterize-then-drop waste.
    """
    cols = [f.name for f in KEY_FIELDS] + ["text"]
    plan = df
    if turn_filter is not None:
        plan = plan.filter(turn_filter)
    plan = plan.select(*[c for c in cols if c in df.columns])
    if partitions:
        # salted hash repartition: per-turn keys => no conversation-skew;
        # salt decorrelates reruns (SURVEY.md §4 "Partitioning / skew")
        plan = plan.repartition(
            partitions, F.xxhash64("conv_id", "turn_idx", F.lit(salt))
        )
    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(df.sparkSession)
    kernel = (
        extract_map_in_pandas
        if max_payload_chars is None
        else make_extract_kernel(max_payload_chars)
    )
    kernel_out = plan.mapInPandas(kernel, schema=KERNEL_SCHEMA)
    # assemble the spans struct view JVM-side (zip of the offset arrays with
    # the row's payload_kind) — whole-stage-codegen'd, no Python cost
    spans = F.zip_with(
        "span_starts",
        "span_ends",
        lambda s, e: F.struct(
            F.col("payload_kind").alias("kind"), s.alias("start"), e.alias("end")
        ),
    )
    return kernel_out.withColumn("spans", spans).select(
        *[f.name for f in OUT_SCHEMA.fields]
    )


def split_oversized_turns(
    df: DataFrame, max_chars: int, text_col: str = "text"
) -> DataFrame:
    """Content-preserving oversized-payload policy (the alternative to
    ``max_payload_chars`` truncation): turns longer than ``max_chars``
    explode into ⌈len/max⌉ chunk rows, keyed (conv_id, turn_idx, chunk_idx);
    concatenating a turn's chunks in chunk_idx order reproduces the original
    text byte-for-byte (pytest-pinned). This is the skew policy for the
    single-huge-turn case: the giant row becomes N normal rows that spread
    across tasks, and extraction stays per-row stateless.

    Two map-only paths, split by row size (no shuffle either way):

    * rows ``<= max_chars`` (approximately all of them) pass through a pure
      JVM projection — chunk_idx 0, untouched;
    * oversized rows chunk through an Arrow kernel where Python string
      slicing is O(chunk). The obvious all-JVM form — ``transform(sequence,
      i -> substr(i*max+1, max))`` — is **quadratic**: Spark strings are
      variable-width UTF8, so each of the k substr calls re-scans from the
      start to find its character offset, O(n·k) total. The round-4
      adversarial-skew bench caught it: one 64 MB turn took 153 s to chunk
      (BENCH/SKEW_BENCH.json history); the kernel does it in well under a
      second. Python slices by code point exactly like ``substr``, so chunk
      boundaries are identical.
    """
    c = F.col(text_col)
    others = [x for x in df.columns if x != text_col]
    small = df.filter(c.isNull() | (F.length(c) <= max_chars)).select(
        *others, F.lit(0).cast("int").alias("chunk_idx"), c.alias(text_col)
    )
    big = df.filter(F.length(c) > max_chars).select(*others, text_col)
    out_fields = [df.schema[x] for x in others] + [
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField(text_col, T.StringType(), True),
    ]
    out_schema = T.StructType(out_fields)
    names = [f.name for f in out_fields]

    def chunker(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col].tolist()
            counts = np.array([-(-len(t) // max_chars) for t in texts], dtype=np.int64)
            out = {o: pdf[o].values.repeat(counts) for o in others}
            out["chunk_idx"] = np.concatenate(
                [np.arange(k, dtype=np.int32) for k in counts]
            ) if len(counts) else np.array([], dtype=np.int32)
            out[text_col] = [
                t[off:off + max_chars]
                for t in texts
                for off in range(0, len(t), max_chars)
            ]
            yield pd.DataFrame(out)[names]

    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(df.sparkSession)
    return small.unionByName(big.mapInPandas(chunker, schema=out_schema))


def metrics_by_partition(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rows (north-star requirement)."""
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("parse_failed").cast("long")).alias("n_parse_failed"),
            F.sum(F.col("truncated").cast("long")).alias("n_truncated"),
            F.sum("n_blocks_kept").alias("n_blocks_kept"),
            F.sum("n_blocks_dropped").alias("n_blocks_dropped"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
    )


def run(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partitions: int | None = None,
    sort_within: bool = True,
    collect_metrics: bool = True,
) -> DataFrame | None:
    """Execute the full pipeline src -> dst (parquet dirs); returns metrics
    (or None when ``collect_metrics=False`` — bench mode, write only)."""
    df = read_transcripts(spark, src_path)
    extracted = build_extract_df(df, partitions=partitions)
    if sort_within:
        # clustered output files: cheap local sort, no extra shuffle
        extracted = extracted.sortWithinPartitions("conv_id", "turn_idx")
    extracted.write.mode("overwrite").parquet(dst_path)
    if not collect_metrics:
        return None
    return metrics_by_partition(spark.read.parquet(dst_path))
