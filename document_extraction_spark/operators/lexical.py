"""Per-document lexical-diversity QC: type-token ratio, hapax-legomenon
fraction, and mean token length — the cheap vocabulary-richness signals a
training-data pipeline cuts on (template spam and keyword-stuffed pages
have pathologically low TTR; OCR noise has pathologically high hapax
fractions; both pass simple length filters).

Distributed shape: tokens explode map-side into ONE (doc_id, token) count
shuffle with map-side combine (the shuffle carries distinct-per-doc token
counts, not raw token instances), then one doc-keyed reduce.  All counts
are integers; the three ratios are single divisions rounded at the edge,
so every row hash-verifies against the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions import textstats as TS


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_types, n_hapax, ttr, hapax_frac, mean_tok_len)
    for every document with at least one token (casefolded whitespace
    tokens, the textstats convention)."""
    tok = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(TS.tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("k"))
    )
    agg = tok.groupBy(id_col).agg(
        F.sum("k").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.length("tok") * F.col("k")).alias("_chars"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        F.round(F.col("n_hapax") / F.col("n_types"), 4).alias("hapax_frac"),
        F.round(F.col("_chars") / F.col("n_tokens"), 4).alias("mean_tok_len"),
    )
