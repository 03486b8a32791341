"""Sequence packing (operators/packing.py): deterministic greedy-with-reset
context-window assembly. Invariants pinned here; value parity vs the DuckDB
recursive-CTE oracle is q_pack_context in the driver contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import packing as PK

CAP = 100


@pytest.fixture(scope="module")
def docs(spark):
    # token counts chosen to exercise: exact fits, overflow resets, an
    # oversized doc (tok > cap), and zero-token docs
    rows = [(i, [30, 40, 30, 70, 101, 5, 0, 60][i % 8] + (i % 3)) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def _collect(packed):
    return sorted(
        (r.doc_id, r.shard, r.bin, r.n_tok) for r in packed.collect()
    )


def test_every_doc_packed_exactly_once(spark, docs):
    out = PK.pack_documents(docs, cap=CAP)
    rows = _collect(out)
    assert len(rows) == 400
    assert len({r[0] for r in rows}) == 400


def test_bins_respect_cap_except_singletons(spark, docs):
    out = PK.pack_documents(docs, cap=CAP)
    stats = PK.bin_stats(out).collect()
    for r in stats:
        if r["n_docs"] > 1:
            assert r["bin_tokens"] <= CAP, (r["shard"], r["bin"], r["bin_tokens"])
    # the oversized docs (101+) exist and each sits alone in its bin
    oversized_bins = {
        (r.shard, r.bin) for r in out.filter(F.col("n_tok") > CAP).collect()
    }
    assert oversized_bins
    per_bin = {(r["shard"], r["bin"]): r["n_docs"] for r in stats}
    assert all(per_bin[k] == 1 for k in oversized_bins)


def test_bins_dense_and_id_ordered_within_shard(spark, docs):
    out = PK.pack_documents(docs, cap=CAP).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        bins = [r.bin for r in rows]
        assert bins[0] == 0
        # id order never decreases the bin; increments are by exactly 1
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


def test_greedy_reset_rule_exact(spark):
    """Hand-computed packing through the REAL operator: doc_ids 21, 23, 28,
    30, 41, 66 all share md5 first-nibble '3' (one shard), so their id order
    is the pack order. Tokens [60, 50, 40, 10, 101, 5] at cap=100 ->
    bins [0, 1, 1, 1, 2, 3]: 60 fits; 50 overflows -> new bin; 40+10 join
    it; 101 is oversized -> alone; 5 opens the next bin (fill reset after
    an overflowing singleton still counts its tokens)."""
    same_shard_ids = [21, 23, 28, 30, 41, 66]
    toks = [60, 50, 40, 10, 101, 5]
    df = spark.createDataFrame(
        list(zip(same_shard_ids, toks)), "doc_id long, n_tok long"
    )
    got = (
        PK.pack_documents(df, cap=100, shard_mode="md5")
        .orderBy("doc_id")
        .collect()
    )
    assert [r.shard for r in got] == [3] * 6
    assert [r.bin for r in got] == [0, 1, 1, 1, 2, 3]


def test_deterministic_across_partitionings(spark, docs):
    a = _collect(PK.pack_documents(docs, cap=CAP))
    b = _collect(PK.pack_documents(docs.repartition(13), cap=CAP))
    assert a == b


def test_shard_of_is_uniform_ish_and_stable(spark, docs):
    out = PK.pack_documents(docs, cap=CAP)
    per_shard = out.groupBy("shard").count().collect()
    assert len(per_shard) == 16
    counts = [r["count"] for r in per_shard]
    assert min(counts) > 5  # 400 docs / 16 shards ~ 25 each


def test_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError, match="cap"):
        PK.pack_documents(docs, cap=0)
    # arbitrary counts only in hash mode; md5 stays oracle-restricted
    with pytest.raises(ValueError, match="n_shards"):
        PK.pack_documents(docs, cap=10, n_shards=7, shard_mode="md5")
    with pytest.raises(ValueError, match="mode"):
        PK.pack_documents(docs, cap=10, shard_mode="sha")
    with pytest.raises(ValueError, match="n_shards"):
        PK.pack_documents(docs, cap=10, n_shards=0)


def test_arbitrary_shard_counts_production_path(spark, docs):
    """VERDICT r3 ask #1: the default hash path must take ANY n_shards —
    thousands of shards is how a 100 TB corpus keeps each applyInPandas
    group executor-sized. Pin the bin invariants at n_shards=4096 and the
    shard function itself (pmod(xxhash64(id)))."""
    out = PK.pack_documents(docs, cap=CAP, n_shards=4096)
    rows = out.collect()
    assert len(rows) == 400 and len({r.doc_id for r in rows}) == 400
    assert all(0 <= r.shard < 4096 for r in rows)
    # shard assignment == pmod(xxhash64(cast(id as string)), 4096), exactly
    expected = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4096))
            .cast("int")
            .alias("s"),
        ).collect()
    }
    assert all(expected[r.doc_id] == r.shard for r in rows)
    # per-shard invariants hold in every occupied shard: dense bins from 0,
    # id order non-decreasing, multi-doc bins within cap
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 300  # 400 docs over 4096 shards: mostly singletons
    for shard, srows in by_shard.items():
        bins = [r.bin for r in srows]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    fills: dict[tuple, list] = {}
    for r in rows:
        fills.setdefault((r.shard, r.bin), []).append(r.n_tok)
    for toks in fills.values():
        if len(toks) > 1:
            assert sum(toks) <= CAP
    # deterministic across input partitionings (shuffle-safe)
    again = _collect(PK.pack_documents(docs.repartition(17), cap=CAP, n_shards=4096))
    assert again == _collect(out)
