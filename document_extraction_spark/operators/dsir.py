"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): score every raw document by how much more likely its hashed-n-gram
features are under a TARGET corpus distribution than under the raw corpus
distribution.  ``log_weight = sum_g count_g * (ln p_target(b(g)) -
ln p_raw(b(g)))`` over the document's word-bigram hash buckets; resampling
raw data proportionally to these weights steers a 100 TB crawl toward a
quality/domain target (the published pipeline selects The Pile subsets
toward Wikipedia+books this way).

Distributed shape (all shuffles bounded or keyed by doc):
- word bigrams generated MAP-SIDE (textstats.word_ngrams — pure codegen
  HOFs, no Python, no explode before the hash);
- the two feature distributions are groupBy counts whose key space is
  ``buckets`` (default 1024) REGARDLESS of corpus size — broadcast tables;
- per-doc scoring: one (doc_id, bucket) count shuffle with map-side
  combine, broadcast-join the log-ratio table, ONE exact-decimal sum per
  doc.

Determinism / oracle story (the lm_score.py recipe): bucket =
hexint13(md5('dsir:' || gram)) % buckets — exact integers on both engines;
each bucket's log-ratio is round(ln(pt) - ln(pr), 5) cast DECIMAL(18,5);
per-doc totals multiply by INTEGER gram counts and sum as DECIMAL — exact
and order-independent.  The only cross-engine risk is an ln() landing
within ~1 ulp of a 1e-5 rounding boundary, the accepted residual class of
ADVICE r4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions import textstats as TS

BUCKETS = 1024


def _bucket(gram_col):
    """hexint13(md5('dsir:' || gram)) % BUCKETS — 13 hex nibbles < 2^52,
    exact in a long on both engines (the cms.py convention)."""
    h = F.md5(F.concat(F.lit("dsir:"), gram_col))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % BUCKETS


def _bucket_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(bucket, cnt): hashed word-bigram feature counts — key space bounded
    by BUCKETS, so this table broadcasts at any corpus size."""
    toks = TS.tokens(F.lower(F.col(text_col)))
    grams = TS.word_ngrams(toks, 2)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(grams).alias("g"))
        .select(_bucket(F.col("g")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: int = 1,
) -> DataFrame:
    """(doc_id, n_grams, log_weight) for every raw document with at least
    one word bigram (documents under 2 tokens carry no features and are
    absent — resample them with a neutral weight upstream if needed).

    ``log_weight`` is the DSIR importance log-ratio under add-``alpha``
    smoothed hashed-bigram unigram models of ``target`` vs ``raw``; higher
    means more target-like.  Exact-decimal arithmetic end to end (see
    module docstring) so the result hash-verifies cross-engine.
    """
    # ONE gram explosion over the raw corpus: the (doc, bucket) count table
    # backs BOTH the raw feature distribution (re-aggregate by bucket — the
    # shuffle input is |docs| x distinct-buckets-per-doc, never raw grams
    # again) and the per-doc scoring join.  localCheckpoint materializes it
    # so the two consumers don't each re-run the scan+explode (the
    # operators/dedup.py candidates recipe; plan audit r6: 12 -> 8
    # exchanges, raw text read once).
    toks_raw = TS.tokens(F.lower(F.col(text_col)))
    doc_buckets = (
        raw.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(TS.word_ngrams(toks_raw, 2)).alias("g"))
        .select(id_col, _bucket(F.col("g")).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=False)
    )
    ct = _bucket_counts(target, text_col)
    cr = doc_buckets.groupBy("bucket").agg(F.sum("k").alias("cnt"))
    tt = ct.agg(F.sum("cnt").alias("tot_t"))
    tr = cr.agg(F.sum("cnt").alias("tot_r"))
    # full outer: buckets unseen in one corpus still get their smoothed mass
    ratios = (
        ct.select("bucket", F.col("cnt").alias("ct"))
        .join(cr.select("bucket", F.col("cnt").alias("cr")), "bucket", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + alpha).cast("double")
                    / (F.col("tot_t") + alpha * BUCKETS)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + alpha).cast("double")
                    / (F.col("tot_r") + alpha * BUCKETS)
                ),
                5,
            )
            .cast("decimal(18,5)")
            .alias("log_ratio"),
        )
    )
    return (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_grams"),
            F.sum(F.col("k") * F.col("log_ratio")).alias("_lw"),
        )
        .select(
            id_col,
            "n_grams",
            F.col("_lw").cast("double").alias("log_weight"),
        )
    )
