"""Bloom-filter runtime join pruning: build a fixed-size bit-set over the
small side's join keys, broadcast it, and drop non-matching probe rows
BEFORE the shuffle — the engine-level version of the runtime filters
Spark 3.3+/Trino inject for selective joins (here explicit, mergeable, and
persistable like the HLL/CMS sketch state).

Why it matters at 100 TB: a semi-join against a 750-key dimension otherwise
shuffles the full fact table; a 2 KB bloom filter broadcast to every task
eliminates ~99.8% of probe rows map-side (false positives only — never false
negatives), so the real join touches |matches| + eps rows. The filter is
LINEAR under bit-or, so per-partition / per-run filters merge cell-wise
(same incremental pattern as operators/cms.py and sketch_state.py).

Distributed shape:
- build: k bucket projections per key are map-side codegen; ONE groupBy
  whose key space is m_bits/32 words regardless of input size;
- probe: the word table (m_bits/32 rows) is broadcast; membership is a
  map-side join + bit test, aggregated per probe key with a k-of-k count.

Determinism: bucket_i = hexint13(md5('bf{i}:' || key)) mod m_bits — the
exact-integer md5 convention shared with operators/cms.py, reproduced
verbatim by the DuckDB twin, so the word table AND every membership verdict
hash-verify across engines. Words are 32-bit lanes in a BIGINT (shift <= 31)
so no sign-bit semantics differ between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 16384
K_HASHES = 3
_LANE = 32  # bits per word; 32 keeps 1 << bit positive in a signed 64-bit


def _buckets(col, k: int, m_bits: int):
    """k exact-integer md5 bucket positions for one key value."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))), 1, 13),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k)
    ]


def bloom_build(df: DataFrame, col: str, m_bits: int = M_BITS,
                k: int = K_HASHES) -> DataFrame:
    """Bit-set as (word_idx, word) rows — m_bits/32 rows max, built with one
    bounded-key groupBy(bit_or). Merge filters by unioning word tables and
    re-aggregating bit_or(word) — the sketch is linear."""
    pos = F.explode(F.array(*_buckets(F.col(col), k, m_bits))).alias("pos")
    return (
        df.select(pos)
        .select(
            F.expr(f"pos div {_LANE}").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {_LANE} as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_prefilter(probes: DataFrame, col: str, bloom: DataFrame,
                    m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """Probe rows that MIGHT be members (all k bits set): the map-side
    prune to run before an expensive join. No false negatives; false
    positives are removed by the real join that follows."""
    # Membership is a property of the KEY, so test each distinct key once:
    # summing per-(key,i) hits over duplicate probe rows would give a member
    # key with multiplicity m a total of m*k and fail the == k test (a false
    # negative).  The closing left_semi restores full probe multiplicity.
    pb = probes.select(col).distinct().select(
        F.col(col),
        F.posexplode(F.array(*_buckets(F.col(col), k, m_bits))).alias("i", "pos"),
    ).select(
        col,
        "i",
        F.expr(f"pos div {_LANE}").alias("word_idx"),
        (F.col("pos") % _LANE).cast("int").alias("bit"),
    )
    hits = (
        pb.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.expr("coalesce(shiftright(word, bit) & 1, 0)"),
        )
        .groupBy(col)
        .agg(F.sum("hit").alias("_nbits"))
        .where(F.col("_nbits") == k)
        .drop("_nbits")
    )
    return probes.join(hits, col, "left_semi")
