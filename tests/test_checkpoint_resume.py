"""Resume/idempotence tests (SURVEY.md §5.4, FIXTURES.md §3): crash after a
partial write -> re-run -> no duplicates, full coverage; completed re-run is a
no-op."""

from __future__ import annotations

import os

import pytest

from document_extraction_spark.plans import checkpoint as CK
from document_extraction_spark.sources.transcripts import write_transcripts_parquet

N_BUCKETS = 8


@pytest.fixture()
def paths(tmp_path):
    src = str(tmp_path / "src")
    n = write_transcripts_parquet(src, n_convs=20, seed=5, rows_per_file=100)
    return src, str(tmp_path / "dst"), str(tmp_path / "ckpt"), n


def _keys(spark, dst):
    rows = spark.read.parquet(dst).select("conv_id", "turn_idx").collect()
    return [(r["conv_id"], r["turn_idx"]) for r in rows]


def test_crash_then_resume_no_duplicates(spark, paths):
    src, dst, ckpt, n_total = paths

    # wave 1 commits, then "crash" (max_waves=1)
    done1 = CK.run_resumable(
        spark, src, dst, ckpt, run_id="r1", n_buckets=N_BUCKETS, wave_size=3, max_waves=1
    )
    assert len(done1) == 3
    partial = len(_keys(spark, dst))
    assert 0 < partial < n_total
    assert CK.read_manifest(spark, ckpt).count() == 3

    # resume processes only the remaining buckets
    done2 = CK.run_resumable(
        spark, src, dst, ckpt, run_id="r2", n_buckets=N_BUCKETS, wave_size=3
    )
    assert sorted(done1 + done2) == list(range(N_BUCKETS))

    keys = _keys(spark, dst)
    assert len(keys) == n_total
    assert len(set(keys)) == n_total  # no duplicate (conv_id, turn_idx)

    # completed run resumes as a no-op
    done3 = CK.run_resumable(
        spark, src, dst, ckpt, run_id="r3", n_buckets=N_BUCKETS
    )
    assert done3 == []
    assert len(_keys(spark, dst)) == n_total


def test_manifest_lineage_metrics(spark, paths):
    src, dst, ckpt, n_total = paths
    CK.run_resumable(spark, src, dst, ckpt, run_id="r1", n_buckets=N_BUCKETS)
    man = CK.read_manifest(spark, ckpt).collect()
    assert sorted(r["bucket"] for r in man) == list(range(N_BUCKETS))
    assert sum(r["n_turns"] for r in man) == n_total
    assert all(r["run_id"] == "r1" for r in man)
    assert sum(r["bytes_in"] for r in man) > 0
    assert os.path.isdir(dst)


def test_interrupted_wave_is_overwritten_not_duplicated(spark, paths):
    """Simulate a crash *between* data write and manifest append: bucket data
    exists but is uncommitted; resume must overwrite it, not append to it."""
    src, dst, ckpt, n_total = paths
    # full data write for wave of all buckets, but never write the manifest
    from pyspark.sql import functions as F
    from document_extraction_spark.plans.extract_pipeline import build_extract_df

    df = spark.read.parquet(src)
    (
        build_extract_df(df)
        .withColumn("bucket", CK.bucket_col(N_BUCKETS))
        .filter(F.col("bucket") < 2)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(dst)
    )
    uncommitted = len(_keys(spark, dst))
    assert uncommitted > 0

    CK.run_resumable(spark, src, dst, ckpt, run_id="r1", n_buckets=N_BUCKETS)
    keys = _keys(spark, dst)
    assert len(keys) == n_total
    assert len(set(keys)) == n_total
