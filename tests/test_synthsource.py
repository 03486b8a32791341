from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.sources.synthsource import register_synth_source


@pytest.fixture(scope="module")
def synth(spark):
    register_synth_source(spark)

    def read(n_partitions=4, convs_per_partition=10, seed=7):
        return (
            spark.read.format("transcripts_synth")
            .option("n_partitions", n_partitions)
            .option("convs_per_partition", convs_per_partition)
            .option("seed", seed)
            .load()
        )

    return read


def test_synth_source_schema_and_rows(spark, synth):
    df = synth()
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    n = df.count()
    assert 4 * 10 * 2 <= n <= 4 * 10 * 400  # sizes range 2..400 per conv
    assert df.select("conv_id").distinct().count() == 40
    # parallelism really comes from the partition inventory
    assert df.rdd.getNumPartitions() == 4


def test_synth_source_deterministic(spark, synth):
    a = sorted(synth().collect())
    b = sorted(synth().collect())
    assert a == b
    # different seed -> different payloads
    c = synth(seed=11)
    assert sorted(c.collect()) != a


def test_synth_source_turn_contiguity(spark, synth):
    """Each conversation's turn_idx must be exactly 0..n-1 (the stable turn
    ordering the north rule keys on)."""
    agg = (
        synth()
        .groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in agg:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_synth_source_feeds_extraction(spark, synth):
    """The source plugs straight into the extraction pipeline."""
    from document_extraction_spark.plans.extract_pipeline import build_extract_df

    out = build_extract_df(synth(n_partitions=2, convs_per_partition=5))
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["text"] is not None for r in rows)


def test_synth_stream_source_drains_deterministically(spark, synth, tmp_path):
    """Streaming flavor of the custom Python data source: offsets advance by
    partitions_per_trigger per micro-batch; the drained stream equals the
    batch read of the same (seed, partitions) exactly."""
    import time

    sdf = (
        spark.readStream.format("transcripts_synth")
        .option("n_partitions", 4)
        .option("partitions_per_trigger", 2)
        .option("convs_per_partition", 10)
        .option("seed", 7)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("synth_stream_drain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_synth"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    batch = synth(n_partitions=4, convs_per_partition=10, seed=7)
    expected = batch.count()
    deadline = time.time() + 240
    while time.time() < deadline:
        if spark.table("synth_stream_drain").count() >= expected:
            break
        time.sleep(1)
    q.stop()
    got = spark.table("synth_stream_drain")
    assert got.count() == expected
    # keyed equality with the batch source (same generator, same bytes)
    assert (
        got.select("conv_id", "turn_idx", "text")
        .exceptAll(batch.select("conv_id", "turn_idx", "text"))
        .count()
        == 0
    )
