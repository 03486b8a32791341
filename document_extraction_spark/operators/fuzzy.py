"""Blocked fuzzy matching: near-identical document pairs by edit distance.

Entity-resolution-style dedup for short payloads (titles, URLs, boilerplate
headers) where token-set similarity (Jaccard/MinHash, operators/dedup.py) is
too coarse: two strings differing by a few character edits. Levenshtein is
quadratic per comparison, so the operator NEVER compares all pairs —
candidates come from equi-join blocking, the same
candidates-then-verify shape as the LSH pipeline.

Plan shape at 100 TB:

* block keys are map-only; the self-join is an equi-join on the block —
  quadratic only WITHIN a block.
* MULTI-KEY blocking: every document enters TWO blocks — its leading tokens
  ("h:") and its trailing tokens ("t:") — and a pair is a candidate if it
  matches in EITHER. Single-key leading-token blocking has a recall hole a
  single first-token typo fully defeats; with head+tail union the corruption
  must hit both ends at once (the MinHash-LSH banding argument, b=2 bands of
  positional tokens). Candidates are distinct'd BEFORE the Levenshtein
  verify so no pair is scored twice.
* ``max_block_size`` drops oversized blocks explicitly, PER KEY (a
  stop-word-ish head block dropping does not lose the pair if its tail
  block is informative); mirroring the LSH hot-bucket cap (dedup.py).
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
    """(doc_a, doc_b, dist): pairs sharing a head- OR tail-token block whose
    ``prefix_chars``-prefix edit distance is <= ``max_distance``;
    doc_a < doc_b, ordered. See module docstring for the multi-key recall
    argument."""
    tk = tokens(F.lower(F.col(text_col)))
    head = F.concat(
        F.lit("h:"), F.array_join(F.slice(tk, 1, block_tokens), " ")
    )
    tail = F.concat(
        F.lit("t:"),
        F.array_join(
            F.slice(
                tk,
                F.greatest(F.size(tk) - F.lit(block_tokens - 1), F.lit(1)),
                block_tokens,
            ),
            " ",
        ),
    )
    base = (
        docs
        # ADVICE r4: blank/whitespace-only documents tokenize to an empty
        # array, collapsing them ALL onto the constant blocks 'h:'/'t:' —
        # one quadratic hot block of pairs carrying zero fuzzy-match signal
        # (and a Spark/DuckDB divergence: array_join('') vs
        # array_to_string(NULL)). They carry no blocking evidence; drop
        # them from the blocking base explicitly.
        .filter(F.size(tk) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array(head, tail)).alias("block"),
            F.substring(F.col(text_col), 1, prefix_chars).alias("prefix"),
        )
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
    cand = (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # a pair matching in both its head and tail blocks arrives twice:
        # dedup BEFORE the O(prefix^2) verify, keyed by the pair only (the
        # prefixes are functionally determined by the ids)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("pa", "pb").cast("long"))
        .filter(F.col("dist") <= max_distance)
        .select("doc_a", "doc_b", "dist")
    )
