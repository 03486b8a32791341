"""Repetition-based quality signals (Gopher-style) for training-data
curation: duplicate-word fraction and top-n-gram coverage per document.

Rae et al., *Scaling Language Models: Methods, Analysis & Insights from
Training Gopher* (2021), §A1.1 filter corpora on within-document repetition:
the fraction of the document made of duplicate lines/paragraphs and of the
most frequent 2/3/4-grams. The reference corpus here is single-line
transcripts, so the line-level signals degenerate and the word/n-gram
variants carry the information.

Plan shape at 100 TB:

* ``dup_word_frac`` is **map-only**: ``size(tokens) - size(array_distinct(
  tokens))`` over each row — pure higher-order-function expression, zero
  shuffle, linear per document.
* ``top2gram_frac`` / ``top3gram_frac`` need the modal n-gram count, which a
  HOF expression would compute quadratically per document (bad for MB-scale
  documents); instead the grams are exploded and counted with ONE shuffle
  keyed ``(doc_id, gram)`` — partial (map-side) aggregation collapses each
  task's repeats before the exchange — then max-reduced per doc_id (second,
  tiny shuffle) and joined back to the map-only frame on doc_id.
* No skew: the shuffle key includes doc_id, so a pathological document
  spreads over its distinct grams, not onto one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens, word_ngrams


def _top_gram_frac(base: DataFrame, n: int, out: str) -> DataFrame:
    """(doc_id, <out>): count of the most frequent word n-gram over the total
    n-gram count, 0.0 for documents shorter than n tokens."""
    grams = base.select(
        "doc_id",
        (F.size("t") - (n - 1)).cast("double").alias("n_grams"),
        F.explode(word_ngrams(F.col("t"), n)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "n_grams", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.first("n_grams"), 4).alias(out)
    )


def boilerplate_span_stats(
    docs: DataFrame,
    n: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document span-level boilerplate detection (the C4 move —
    Raffel et al. 2020 drop any three-sentence span occurring more than
    once; here the span unit is a word n-gram because the transcript corpus
    has no sentence boundaries): per document, how many of its n-gram spans
    appear in >= ``min_df`` distinct documents.

    Returns (doc_id, n_spans, n_boilerplate, boilerplate_frac).

    Plan shape at 100 TB:

    * per-doc distinct grams feed the document-frequency count — ONE shuffle
      keyed by gram with map-side combine; the hottest grams are exactly the
      boilerplate, which partial aggregation compresses best.
    * per-doc instance counts collapse to (doc_id, gram, c) BEFORE joining
      the flagged-gram set, so a hot boilerplate gram fans out once per
      containing document, never once per occurrence.
    * total span count per doc is map-only (size of the gram array).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.lower(F.col(text_col))).alias("t")
    )
    grams = base.select(
        "doc_id", F.explode(word_ngrams(F.col("t"), n)).alias("gram")
    )
    per_doc = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    flagged = (
        per_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    boiler = (
        per_doc.join(flagged, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_boilerplate"))
    )
    spans = base.select(
        "doc_id",
        F.greatest(F.size("t") - (n - 1), F.lit(0)).cast("long").alias("n_spans"),
    )
    return (
        spans.join(boiler, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_boilerplate", F.lit(0)).cast("long").alias("n_boilerplate"),
            F.round(
                F.coalesce("n_boilerplate", F.lit(0)).cast("double")
                / F.greatest(F.col("n_spans"), F.lit(1)).cast("double"),
                4,
            ).alias("boilerplate_frac"),
        )
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals:
    (doc_id, n_words, dup_word_frac, top2gram_frac, top3gram_frac).

    ``dup_word_frac`` = 1 - distinct/total words; ``topNgram_frac`` = share
    of n-gram slots taken by the single most frequent n-gram. All fractions
    rounded to 4 decimals for engine-stable comparison.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.lower(F.col(text_col))).alias("t")
    )
    words = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_words"),
        F.round(
            (F.size("t") - F.size(F.array_distinct("t"))).cast("double")
            / F.greatest(F.size("t"), F.lit(1)).cast("double"),
            4,
        ).alias("dup_word_frac"),
    )
    top2 = _top_gram_frac(base, 2, "top2gram_frac")
    top3 = _top_gram_frac(base, 3, "top3gram_frac")
    return (
        words.join(top2, "doc_id", "left")
        .join(top3, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "dup_word_frac",
            F.coalesce("top2gram_frac", F.lit(0.0)).alias("top2gram_frac"),
            F.coalesce("top3gram_frac", F.lit(0.0)).alias("top3gram_frac"),
        )
    )
