"""Sequence-structured text operators: topic segmentation within an
ordered unit stream (TextTiling-style, Hearst 1997 reduced to its lexical
core) and ordered-sequence fingerprinting (conversation-level dedup robust
to per-turn whitespace noise).

Both operate on (key, order, text) streams — transcript turns, document
sentences, log lines — and both cost exactly ONE shuffle on the key.

Topic boundaries — integer-exact lexical cohesion: a boundary falls
between adjacent units when their token-set Jaccard drops below a
threshold.  Floats never appear: with threshold expressed in millis,
``jaccard < t/1000  <=>  1000 * |A ∩ B| < t * |A ∪ B|`` — pure BIGINT
comparison, so segment assignments hash-verify.  Segment ids are the
running sum of boundary flags (one ordered window over the same key
exchange the lag uses).

Sequence fingerprints — md5 over the ORDER-SORTED per-unit fingerprints:
two conversations collide iff every turn's normalized text matches in
order.  The per-unit fingerprint is textstats.fingerprint (lower, trim,
whitespace-collapse), so cosmetic differences don't break the match — this
is exact dedup lifted from row granularity to sequence granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import fingerprint, tokens


def topic_boundaries(
    df: DataFrame,
    key_col: str,
    order_col: str,
    text_col: str,
    threshold_millis: int = 100,
) -> DataFrame:
    """Adds (is_boundary, segment_id) to each unit.  The first unit of a
    key is segment 0 and never a boundary; empty token sets never match
    anything (union > 0 guard keeps blank units from gluing segments)."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    tk = F.array_distinct(tokens(F.lower(F.col(text_col))))
    inter = F.size(F.array_intersect(F.col("_tk"), F.col("_prev")))
    union = F.size(F.array_union(F.col("_tk"), F.col("_prev")))
    boundary = F.when(F.col("_prev").isNull(), F.lit(False)).otherwise(
        # jaccard < t/1000 as exact integers; empty-vs-empty (union 0)
        # counts as a boundary — no shared vocabulary, no cohesion
        (1000 * inter) < (F.lit(threshold_millis) * F.greatest(union, F.lit(1)))
    )
    return (
        df.withColumn("_tk", tk)
        .withColumn("_prev", F.lag("_tk").over(w))
        .withColumn("is_boundary", boundary)
        .withColumn(
            "segment_id",
            F.sum(F.col("is_boundary").cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_tk", "_prev")
    )


def sequence_fingerprint(
    df: DataFrame, key_col: str, order_col: str, text_col: str
) -> DataFrame:
    """(key, n_units, seq_fp): md5 over the order-sorted per-unit
    fingerprints, '|'-joined.  One groupBy on the key; the sort happens
    array-side inside the aggregate row, not as a shuffle."""
    unit = F.struct(F.col(order_col).alias("o"), fingerprint(F.col(text_col)).alias("f"))
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.array_sort(F.collect_list(unit)).alias("_units"),
        )
        .select(
            key_col,
            "n_units",
            F.md5(
                F.array_join(F.transform("_units", lambda u: u["f"]), "|")
            ).alias("seq_fp"),
        )
    )


def sequence_dup_groups(
    df: DataFrame, key_col: str, order_col: str, text_col: str
) -> DataFrame:
    """Sequence-level exact dedup: (seq_fp, n_keys, keeper) — groups of
    keys whose whole normalized unit sequence matches, keeper = min key
    (the standard exact-dedup keeper rule lifted to sequences)."""
    fps = sequence_fingerprint(df, key_col, order_col, text_col)
    return (
        fps.groupBy("seq_fp")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min(key_col).alias("keeper"),
        )
        .where(F.col("n_keys") > 1)
    )
