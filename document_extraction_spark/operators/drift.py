"""Corpus drift monitoring: per-term Jensen-Shannon divergence contributions
between two corpus snapshots' unigram distributions.

A continuously-ingested training corpus needs a cheap answer to "did this
week's crawl change the language distribution?" — the standard monitor is
the JS divergence between unigram distributions, and the per-term
contributions name WHICH terms moved (new boilerplate, a spam burst, a
domain mix shift).

Plan shape at 100 TB:

* one tokenize->explode->groupBy(term) per snapshot — the irreducible
  term-count shuffle, with map-side combine (same shape as TF-IDF,
  operators/tfidf.py);
* the two count frames join on term (FULL OUTER: a term present in only one
  snapshot is exactly the drift signal, contributing x/2 * ln(2) mass);
* totals are one-row broadcast frames; contributions are map-only math;
* output is top-k by contribution — TakeOrderedAndProject, never a full
  sort of the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens


def _term_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def unigram_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    text_col: str = "text",
    top_k: int = 200,
) -> DataFrame:
    """(term, p_a, p_b, js): the ``top_k`` terms by Jensen-Shannon
    contribution between the two snapshots' unigram distributions.
    ``sum(js)`` over the FULL vocabulary is JSD(A||B) in nats (bounded by
    ln 2); the per-term rows are the actionable monitor. All probabilities
    and contributions are rounded at the edge (engine-stable ordering:
    rounded js desc, term asc)."""
    a = _term_counts(snap_a, text_col)
    b = _term_counts(snap_b, text_col)
    tot_a = a.agg(F.sum("c").cast("double").alias("ta"))
    tot_b = b.agg(F.sum("c").cast("double").alias("tb"))
    joined = (
        a.withColumnRenamed("c", "ca")
        .join(b.withColumnRenamed("c", "cb"), "term", "full_outer")
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "term",
            (F.coalesce("ca", F.lit(0)).cast("double") / F.col("ta")).alias("p"),
            (F.coalesce("cb", F.lit(0)).cast("double") / F.col("tb")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    # x * ln(x/m) with the 0*ln(0) = 0 convention per side
    term = (
        F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    ) / 2.0
    out = joined.select(
        "term",
        (F.round("p", 6) + F.lit(0.0)).alias("p_a"),
        (F.round("q", 6) + F.lit(0.0)).alias("p_b"),
        (F.round(term, 7) + F.lit(0.0)).alias("js"),
    )
    return out.orderBy(F.col("js").desc(), F.col("term").asc()).limit(top_k)
