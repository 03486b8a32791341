"""Full-text search primitives: inverted index build and BM25 top-k scoring.

A training-data pipeline needs keyword search over the corpus (targeted
audits, contamination spot-checks, topic mining). Both operators here are
expressed as pure DataFrame aggregations so Catalyst/AQE own the physical
plan.

Plan shape at 100 TB:

* Term frequencies: tokenize (map-only HOF) -> explode -> groupBy
  ``(doc_id, term)`` — ONE shuffle with map-side partial aggregation, the
  same irreducible shuffle as TF-IDF (operators/tfidf.py).
* BM25 filters the exploded stream to the query terms BEFORE the shuffle
  (a handful of literals pushed into the scan's generated filter), so the
  per-query shuffle is proportional to the query's posting lists, not the
  corpus. Document length and avgdl come from a separate count aggregate;
  the two scalar corpus stats (N, avgdl) join in as broadcast one-row
  frames — the plan stays lazy, nothing collects on the driver.
* The inverted index caps each posting list at ``max_postings`` (real
  systems shard long posting lists; a 100 TB corpus would make stop-word
  postings unboundedly long otherwise) while ``df`` keeps the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import token_count, tokens


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1000,
) -> DataFrame:
    """(term, df, postings_json): document frequency plus the first
    ``max_postings`` doc ids (ascending) serialized as a JSON array —
    serialized so the frame stays oracle-comparable (raw arrays crash the
    driver's canonicalizer)."""
    from pyspark.sql import Window

    tf = _doc_terms(docs, id_col, text_col).groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # bound the collected list BEFORE aggregation: collect_list(when(rn<=cap))
    # skips nulls, so the agg buffer holds at most max_postings ids per term —
    # a stop-word term at corpus scale no longer materializes its full
    # posting list in memory just to slice it afterwards. df stays exact
    # (count over ALL rows, ranked or not). The rank window shuffles on the
    # same key as the final groupBy, so AQE coalesces them into one exchange.
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = tf.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.to_json(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_rn") <= max_postings, F.col("doc_id"))
                )
            )
        ).alias("postings_json"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching over positional postings: (doc_id, start_pos)
    for every token position where the full phrase occurs in order,
    start_pos 0-based over the whitespace token sequence.

    Plan shape: posexplode is map-only; the ``isin(phrase)`` filter lands
    BEFORE the shuffle (only the phrase terms' postings move, not the
    corpus); the broadcast (term, offset) table maps each hit to its
    candidate start (p - offset), correctly handling repeated terms inside
    the phrase; ONE groupBy((doc_id, start)) then keeps starts covering
    every distinct offset. This is the classic positional-index phrase
    intersection (Manning et al., IR ch. 2) as a single bounded shuffle —
    no self-join chain, so an n-word phrase costs the same one exchange as
    a 2-word phrase."""
    q = [t.lower() for t in phrase]
    needles = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(t, i) for i, t in enumerate(q)], "term string, offset int"
        )
    )
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
        )
        .where(F.col("term").isin(q))
        .join(needles, "term")
        .select("doc_id", (F.col("pos") - F.col("offset")).alias("start_pos"), "offset")
        .where(F.col("start_pos") >= 0)
    )
    return (
        hits.groupBy("doc_id", "start_pos")
        .agg(F.countDistinct("offset").alias("_cov"))
        .where(F.col("_cov") == len(q))
        .drop("_cov")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 (Robertson/Sparck-Jones idf variant):
    (doc_id, score). Deterministic order: rounded score desc, doc_id asc —
    rounding BEFORE ordering keeps the ranking engine-stable."""
    terms = _doc_terms(docs, id_col, text_col)
    # document length is MAP-ONLY (array size), not explode+groupBy — at
    # corpus scale the per-doc length must never cost a token-wide shuffle
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.lower(F.col(text_col))).alias("dl_raw"),
    )
    # avgdl from an exact integer sum (not avg-of-doubles) so the scalar is
    # bit-identical regardless of aggregation order / engine
    stats = dl.agg(
        (F.sum("dl_raw").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    q = [t.lower() for t in query_terms]
    tf = (
        terms.filter(F.col("term").isin(q))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("dl_raw").cast("double") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg((F.round(F.sum("term_score"), 4) + F.lit(0.0)).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
