"""Blocked fuzzy matching: near-identical document pairs by edit distance.

Entity-resolution-style dedup for short payloads (titles, URLs, boilerplate
headers) where token-set similarity (Jaccard/MinHash, operators/dedup.py) is
too coarse: two strings differing by a few character edits. Levenshtein is
quadratic per comparison, so the operator NEVER compares all pairs —
candidates come from equi-join blocking, the same
candidates-then-verify shape as the LSH pipeline.

Plan shape at 100 TB:

* block key (leading tokens) is map-only; the self-join is an equi-join on
  the block — quadratic only WITHIN a block.
* ``max_block_size`` drops oversized blocks explicitly (stop-word-ish
  leading tokens would otherwise recreate the all-pairs join); the
  candidates-lost count is observable by comparing block sizes, mirroring
  the LSH hot-bucket cap (dedup.py).
* ``prefix_chars`` bounds the per-comparison cost: distance runs on fixed
  prefixes, so one comparison is O(prefix²) regardless of payload size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens


def blocked_levenshtein_pairs(
    docs: DataFrame,
    max_distance: int = 15,
    block_tokens: int = 2,
    prefix_chars: int = 60,
    max_block_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, dist): pairs within the same leading-token block whose
    ``prefix_chars``-prefix edit distance is <= ``max_distance``;
    doc_a < doc_b, ordered."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(
            F.slice(tokens(F.lower(F.col(text_col))), 1, block_tokens), " "
        ).alias("block"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("prefix"),
    )
    # no broadcast hint: the allowed-block set is proportional to the number
    # of distinct blocks — AQE picks the join strategy from its actual size
    sizes = base.groupBy("block").agg(F.count(F.lit(1)).alias("_bs"))
    bounded = base.join(
        sizes.filter(F.col("_bs") <= max_block_size).select("block"),
        "block",
        "left_semi",
    )
    a = bounded.select(
        F.col("block"), F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
    )
    b = bounded.select(
        F.col("block"), F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
    )
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", F.levenshtein("pa", "pb").cast("long"))
        .filter(F.col("dist") <= max_distance)
        .select("doc_a", "doc_b", "dist")
    )
