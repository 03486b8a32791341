"""TF-IDF top-terms per document — the classic corpus-statistics operator a
training-data pipeline needs (salient-term extraction, near-topic tagging,
quality filters keyed on term salience).

Plan shape (and why it scales):

* tokenize -> explode -> groupBy (doc_id, term): ONE shuffle keyed by the
  pair — partial (map-side) aggregation collapses each task's duplicate
  terms before the exchange, so the shuffle carries per-task-distinct pairs,
  not raw tokens.
* document frequency: groupBy term over the already-(doc,term)-distinct tf
  frame — a second, much smaller shuffle; stop-word-grade hot terms are
  exactly the rows partial agg compresses best.
* corpus size N joins in as a broadcast scalar (no driver-side collect —
  the plan stays lazy end-to-end).
* top-k per doc: row_number window over the tf frame, deterministic
  tie-break (score desc, term asc).

Smoothed IDF: ``ln((N + 1) / (df + 1)) + 1`` (the standard add-one variant —
never division by zero, never negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens


def tf_idf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    (doc_id, term, tf, score, rank)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df").cast("double") + 1.0))
                    + 1.0
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )
