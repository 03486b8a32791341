"""Hybrid retrieval: fuse sparse (BM25) and dense (embedding-cosine) rankings
with reciprocal-rank fusion (Cormack et al. 2009) — the standard way modern
retrieval stacks combine a keyword leg and a vector leg without score
calibration, since RRF consumes only RANKS.

Distributed shape:
- each leg is the already-scale-audited operator (search.bm25_topk: postings
  filtered to query terms before the shuffle; similarity top-k: broadcast
  query, corpus never shuffles);
- the fusion itself is a full-outer join of two k-row frames (k = leg depth,
  tiny regardless of corpus size) — at 100 TB the legs bound all cost, the
  fusion is free.

Determinism / oracle story: RRF contributions are INTEGER-exact —
``1000000 div (k0 + rank)`` per leg (floor division, engine-exact like
operators/graphrank.py) — so fused scores and the final ordering
hash-verify. Both legs' ranks are already engine-stable (rounded score desc,
id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 1_000_000


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    id_col: str = "doc_id",
    k0: int = RRF_K,
    top: int = 20,
) -> DataFrame:
    """Fuse two (id, rank) frames: rrf_micro = sum over legs of
    RRF_SCALE div (k0 + rank); a doc missing from a leg contributes 0.
    Output: (id, sparse_rank, dense_rank, rrf_micro), top rows by
    (rrf_micro desc, id)."""
    s = sparse.select(F.col(id_col), F.col("rank").alias("sparse_rank"))
    d = dense.select(F.col(id_col), F.col("rank").alias("dense_rank"))

    def contrib(c: str):
        return F.coalesce(F.expr(f"{RRF_SCALE} div ({k0} + {c})"), F.lit(0))

    return (
        s.join(d, id_col, "full_outer")
        .withColumn("rrf_micro", contrib("sparse_rank") + contrib("dense_rank"))
        .orderBy(F.col("rrf_micro").desc(), F.col(id_col))
        .limit(top)
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k_each: int = 50,
    top: int = 20,
) -> DataFrame:
    """Two-leg hybrid query over a corpus with aligned (doc_id == vec_id)
    text and embedding tables: BM25 over ``query_terms`` fused with exact
    cosine top-k around the ``query_vec_id`` embedding."""
    from document_extraction_spark.operators.search import bm25_topk
    from document_extraction_spark.operators.similarity import brute_force_topk

    sparse = bm25_topk(docs, query_terms, k=k_each).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        ),
    )
    dense = (
        brute_force_topk(
            embeddings,
            embeddings.where(F.col("vec_id") == query_vec_id),
            k=k_each,
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(sparse, dense, top=top)
