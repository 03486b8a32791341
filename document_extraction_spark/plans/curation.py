"""The composed training-data curation pipeline — the engine's operators
chained the way a real pre-training data run chains them:

    extract (classify -> strip/layout -> normalize)
      -> quality gate  (functions/textstats.quality_score)
      -> language gate (functions/textstats.lang_guess)
      -> dedup         (fingerprint keep-first, or MinHash-LSH near-dup drop)

One lazy DataFrame plan end-to-end: the extraction kernel is the only Python
stage; every gate is a codegen'd Column expression; dedup adds the one
fingerprint shuffle (exact) or the LSH bucket join (near). Nothing collects
to the driver.

At 100 TB the gate order matters and is deliberate: quality/lang filters are
map-only and run BEFORE the dedup shuffle, so the exchange only carries rows
that survive the cheap predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_extraction_spark.functions import textstats as TS
from document_extraction_spark.plans.extract_pipeline import build_extract_df


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents(doc_id, text, ...) -> curated (doc_id, text, quality, lang)
    with exact-dup rows collapsed to the smallest doc_id; optionally also
    drop MinHash-LSH near-duplicates at ``near_dup_threshold`` (greedy
    pairwise policy: a doc is dropped iff it is the larger id of a verified
    pair — for transitive-closure semantics run operators/dedup.dedup_clusters
    and keep one id per cluster)."""
    turns = docs.select(
        F.col(id_col).cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col(text_col).alias("text"),
    )
    extracted = build_extract_df(turns).select(
        F.col("conv_id").cast("long").alias(id_col),
        F.col("text"),
    )
    # r7 gate restructure (the dedup.py plan-shape note): quality_score and
    # lang_guess both tokenize, and lang_guess's argmax references each
    # language's hit count twice — inlined, the interpreted tokenize+filter
    # HOFs re-ran up to 9x per row.  Naming the token array, its lowered
    # form, and the four hit counts as projection outputs evaluates each
    # ONCE; the _from variants apply the identical expression tails, so
    # every gate value (and the oracle hash) is unchanged.
    with_toks = extracted.select(
        id_col,
        "text",
        TS.tokens(F.col("text")).alias("_tk"),
    )
    with_hits = with_toks.select(
        id_col,
        "text",
        F.size("_tk").cast("long").alias("_ntok"),
        F.transform("_tk", lambda t: F.lower(t)).alias("_tkl"),
    ).select(
        id_col,
        "text",
        "_ntok",
        *[
            TS.stopword_hits_from_lower_tokens(F.col("_tkl"), lang).alias(f"_h_{lang}")
            for lang in TS.STOPWORDS
        ],
    )
    gated = (
        with_hits.select(
            id_col,
            "text",
            TS.quality_score_from(
                F.col("_ntok"), TS.punct_count(F.col("text")), F.col("text")
            ).alias("quality"),
            TS.lang_guess_from_hits(
                {lang: F.col(f"_h_{lang}") for lang in TS.STOPWORDS}
            ).alias("lang"),
            TS.fingerprint(F.col("text")).alias("_fp"),
        )
        .filter(F.col("quality") >= min_quality)
        .filter(F.col("lang").isin(*langs))
    )
    w = Window.partitionBy("_fp").orderBy(id_col)
    exact_deduped = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )
    if near_dup_threshold is None:
        return exact_deduped
    from document_extraction_spark.operators.dedup import near_dup_pairs_pipeline

    pairs = near_dup_pairs_pipeline(
        exact_deduped, threshold=near_dup_threshold, id_col=id_col, text_col="text"
    )
    # drop the larger id of every verified near-dup pair (keep cluster min)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return exact_deduped.join(losers, id_col, "left_anti")
