"""Template mining: find boilerplate sentence TEMPLATES — sentences that
repeat across many documents up to slot variation (numbers, ids) — the
corpus-level complement to the per-document repetition signals
(operators/quality_signals.py) and the span-level exact dedup
(operators/span_dedup.py). Classic examples a crawl corpus is full of:
"copyright # all rights reserved", "page # of #", "order # has shipped".

Method: sentence split (the q_sentence_explode convention: '\\.\\s+'),
normalize to a template (lowercase, digit runs -> '#', whitespace collapse),
then ONE groupBy(template) computing document frequency, occurrence count,
and surface-form variety. Templates with high df and >1 variant are
slot-varying boilerplate; df-high single-variant templates are verbatim
boilerplate (already removable by span dedup — the variant count is what
distinguishes the two).

Distributed shape: sentence explode + normalization are map-only codegen;
the single shuffle is groupBy(template) (map-side combinable for count;
the two count-distincts expand to a two-phase plan — at 100 TB, pre-reduce
with a per-doc array_distinct on the template array before exploding if df
is the only metric needed)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentence_templates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, sentence, template) — map-only explode + normalize."""
    sent = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\.\s+")).alias("sentence"),
    ).where(F.trim("sentence") != "")
    template = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("sentence")), "[0-9]+", "#"), " +", " "
        )
    )
    return sent.withColumn("template", template)


def mine_templates(docs: DataFrame, min_df: int = 3, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Boilerplate templates with document frequency >= min_df:
    (template, n_docs, n_occ, n_variants)."""
    st = sentence_templates(docs, id_col, text_col)
    return (
        st.groupBy("template")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("sentence").alias("n_variants"),
        )
        .where(F.col("n_docs") >= min_df)
    )


def _normalize(col):
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[0-9]+", "#"), " +", " ")
    )


def mine_message_templates(df: DataFrame, id_col: str, msg_col: str,
                           min_df: int = 2) -> DataFrame:
    """Whole-message templating (Drain-style log templating): each message
    is one unit; digit-run normalization collapses parameterized log lines /
    JSON payloads onto their template. (template, n_docs, n_occ,
    n_variants) with n_docs = distinct id_col. Map-only normalize + ONE
    groupBy(template)."""
    t = df.where(F.col(msg_col).isNotNull()).select(
        F.col(id_col), F.col(msg_col).alias("raw"), _normalize(F.col(msg_col)).alias("template")
    )
    return (
        t.groupBy("template")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("raw").alias("n_variants"),
        )
        .where(F.col("n_docs") >= min_df)
    )


def mine_gram_templates(docs: DataFrame, n: int = 3, min_df: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Token n-gram templating: sliding n-token windows, digit-normalized —
    catches boilerplate shorter than a sentence (the granularity span_dedup
    removes verbatim; here slots may vary). Gram generation is map-only
    (sequence + slice + array_join in codegen); ONE groupBy(template)."""
    from document_extraction_spark.functions.textstats import tokens

    tk = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("tk")
    ).where(F.size("tk") >= n)
    grams = tk.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(tk) - {n - 1}),"
                f" i -> array_join(slice(tk, i, {n}), ' '))"
            )
        ).alias("raw"),
    )
    return (
        grams.withColumn("template", _normalize(F.col("raw")))
        .groupBy("template")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("raw").alias("n_variants"),
        )
        .where(F.col("n_docs") >= min_df)
    )
