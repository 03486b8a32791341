"""Incremental dedup against a persisted LSH index
(operators/incremental_dedup.py).

Covers the production loop: build index from a corpus, probe with a new
batch, flag near-dups by signature agreement — plus the scale property the
operator exists for: the index probe's parquet scan carries a dynamic
partition-pruning filter on the bucket-prefix partition key, so probing
cost scales with the batch, not the corpus.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators.incremental_dedup import (
    build_lsh_index,
    flag_new_batch,
    incremental_dedup_candidates,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "completely unrelated corpus text about spark shuffle partitions and joins"),
    (3, "a third document with its own distinct content about parquet row groups"),
]
BATCH = [
    # near-identical to corpus doc 1 (one token changed)
    (10, "the quick brown fox jumps over the lazy cat near the river bank today"),
    # genuinely new
    (11, "entirely novel text that matches nothing in the existing corpus at all"),
]


@pytest.fixture(scope="module")
def flagged(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])
    path = tempfile.mkdtemp(prefix="lsh_idx_test_")
    build_lsh_index(corpus, path)
    out = flag_new_batch(spark, batch, path, min_est=0.5).collect()
    return {r["doc_id"]: r for r in out}


def test_near_dup_flagged_with_match(flagged):
    r = flagged[10]
    assert r["is_dup"] and r["dup_of"] == 1
    assert r["n_eq"] >= 4  # one-token edit keeps most minhash components
    assert r["est_jaccard"] == pytest.approx(r["n_eq"] / 8.0, abs=1e-4)


def test_unique_doc_passes(flagged):
    r = flagged[11]
    assert not r["is_dup"]
    assert r["dup_of"] is None and r["n_eq"] is None


def test_probe_scan_is_partition_pruned(spark, testdata_dir):
    """The index scan must carry a dynamic partition-pruning expression on
    the bucket-prefix key — at 100 TB this is what keeps a batch probe from
    scanning the whole index."""
    d = spark.read.parquet(f"{testdata_dir}/sf0.001/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0).limit(10)
    path = tempfile.mkdtemp(prefix="lsh_idx_plan_")
    build_lsh_index(corpus, path)
    cand = incremental_dedup_candidates(spark, batch, path)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_exact_dup_maxes_estimator(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(20, CORPUS[1][1])], ["doc_id", "text"]  # byte-identical to doc 2
    )
    path = tempfile.mkdtemp(prefix="lsh_idx_exact_")
    build_lsh_index(corpus, path)
    r = flag_new_batch(spark, batch, path).collect()[0]
    assert r["is_dup"] and r["dup_of"] == 2
    assert r["n_eq"] == 8 and r["est_jaccard"] == 1.0


def test_bp_derived_from_hash_not_fixed_offset(spark):
    """r5 ADVICE (low): with bands >= 10 a fixed substring(bucket, 3, n)
    lands inside the '{band}:' prefix for two-digit bands, collapsing their
    partitions.  bp must come from the md5 part after the colon for EVERY
    band, keeping all 16 hex values reachable per band."""
    from document_extraction_spark.operators.incremental_dedup import (
        _band_buckets,
    )

    # synthetic 24-component signatures (bands=12 -> two-digit band indices);
    # _band_buckets only needs h0..h23 columns, not real minhashes
    rows = [tuple([i] + [f"{(i * 131 + j * 17) % 997:08x}" for j in range(24)])
            for i in range(60)]
    sig = spark.createDataFrame(
        rows, ["doc_id"] + [f"h{j}" for j in range(24)]
    )
    b = _band_buckets(sig, k=24, bands=12)
    got = b.select(
        "bucket", "bp",
        F.substring(F.substring_index("bucket", ":", -1), 1, 1).alias("want"),
    ).collect()
    assert all(r["bp"] == r["want"] for r in got)
    # two-digit bands must NOT all collapse onto ':' / a digit slice
    hi = b.where(F.split("bucket", ":")[0].cast("int") >= 10)
    assert hi.select("bp").distinct().count() > 1
