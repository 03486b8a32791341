"""Reciprocal best-match pair mining — the bitext/parallel-corpus mining
shape (Artetxe & Schwenk 2019's margin-based mining, minus the margin term):
a candidate pair (l, r) across two corpora survives iff r is l's nearest
neighbour in the right corpus AND l is r's nearest neighbour in the left.
Mutuality is the classic high-precision filter: one-directional top-1 pairs
include every hub vector's spurious matches; requiring both directions
removes them with no threshold to tune.

Distributed shape (scores computed ONCE — structurally, not by cache):
- one broadcast cross product left x right scored with the repo's standard
  cosine formulation (operators/similarity.py — rank on the raw double,
  vec_id tiebreak, round only at the edge: the q_ann_topk-proven
  exactness recipe);
- mutuality needs NO self-join: a pair (l, r) is mutual iff the SAME
  scored row has row_number 1 under both partitionings, so the two
  argmax windows chain over one scored child (plan-shape pinned: exactly
  one scoring join node — a naive `best_l JOIN best_r` re-evaluates the
  whole cross product per branch, doubling the quadratic cost).

At 100 TB neither side is broadcastable and the cross product is the cost:
the scale path swaps the exact scorer for SRP-bucketed candidates
(similarity.py srp_* — score only colliding buckets, same downstream
mutuality join), trading recall for the quadratic. The mutual filter is
unchanged either way, which is why it lives here as its own operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_extraction_spark.operators.similarity import cosine


def mutual_top1_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float | None = None,
) -> DataFrame:
    """(left_id, right_id, cos): pairs where each side is the other's
    top-1.  ``min_cos`` (on the rounded score) optionally drops weak mutual
    pairs — disjoint corpora can be mutually-nearest yet unrelated."""
    l = left.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("lvec")
    )
    r = right.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("rvec")
    )
    scored = (
        l.crossJoin(F.broadcast(r))
        # two-step projection so the O(dim) cosine evaluates once per pair
        .select(
            "left_id",
            "right_id",
            cosine(F.col("lvec"), F.col("rvec")).alias("_raw"),
        )
        .select("left_id", "right_id", F.col("_raw"), F.round("_raw", 4).alias("cos"))
    )
    w_l = Window.partitionBy("left_id").orderBy(F.col("_raw").desc(), "right_id")
    w_r = Window.partitionBy("right_id").orderBy(F.col("_raw").desc(), "left_id")
    out = (
        scored.withColumn("rk_l", F.row_number().over(w_l))
        .withColumn("rk_r", F.row_number().over(w_r))
        .where((F.col("rk_l") == 1) & (F.col("rk_r") == 1))
        .select("left_id", "right_id", "cos")
    )
    if min_cos is not None:
        out = out.where(F.col("cos") >= min_cos)
    return out
