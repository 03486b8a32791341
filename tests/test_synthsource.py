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


def test_stream_reader_offset_monotonic_across_restart():
    """ADVICE r3: a restarted query constructs a FRESH reader (counter back
    at 0) but hands it the checkpointed start offset; latestOffset must never
    report below the committed position or the engine plans empty/backwards
    batches until the counter catches up."""
    from document_extraction_spark.sources.synthsource import (
        TranscriptsSynthStreamReader,
    )

    opts = {"n_partitions": 8, "partitions_per_trigger": 2}
    first = TranscriptsSynthStreamReader(opts)
    assert first.latestOffset() == {"index": 2}
    assert first.latestOffset() == {"index": 4}
    first.commit({"index": 4})

    # restart: new instance, checkpoint says start at 4
    restarted = TranscriptsSynthStreamReader(opts)
    restarted.partitions({"index": 4}, {"index": 4})
    nxt = restarted.latestOffset()["index"]
    assert nxt >= 4  # was 2 before the fix (regressed below the checkpoint)
    assert nxt <= 8
    # commit also seeds the cursor
    other = TranscriptsSynthStreamReader(opts)
    other.commit({"index": 6})
    assert other.latestOffset()["index"] >= 6


def test_stream_reader_committed_restart_latest_first(tmp_path):
    """ADVICE r4: when the LAST batch was committed before the crash, the
    restarted query calls latestOffset() on the fresh reader BEFORE any
    partitions() call. With cursor_path the persisted commit seeds the fresh
    instance and latestOffset is monotonic in this ordering too; without it,
    the regressed end must at least plan an EMPTY (never backwards) batch."""
    from document_extraction_spark.sources.synthsource import (
        TranscriptsSynthStreamReader,
    )

    cursor = str(tmp_path / "synth_cursor")
    opts = {"n_partitions": 8, "partitions_per_trigger": 2, "cursor_path": cursor}
    first = TranscriptsSynthStreamReader(opts)
    first.latestOffset()
    first.latestOffset()
    first.commit({"index": 4})

    # committed restart: latestOffset() fires first on the fresh instance
    restarted = TranscriptsSynthStreamReader(opts)
    nxt = restarted.latestOffset()["index"]
    assert nxt >= 4  # persisted cursor prevents the regression entirely
    assert nxt <= 8
    # and the planned batch from the checkpointed start is forward-only
    parts = restarted.partitions({"index": 4}, {"index": nxt})
    assert [p.value for p in parts] == list(range(4, nxt))

    # without cursor_path the first latest after a committed restart DOES
    # regress — but partitions() clamps it to an empty batch, not backwards
    bare = TranscriptsSynthStreamReader(
        {"n_partitions": 8, "partitions_per_trigger": 2}
    )
    regressed = bare.latestOffset()["index"]
    assert regressed == 2  # documented one-restart duplicate window
    assert bare.partitions({"index": 4}, {"index": regressed}) == []
