"""KWIC (keyword-in-context) concordance — for a query term, the ±w-token
window around every hit.  This is the corpus-inspection primitive behind
"show me how the corpus uses X": quality audits eyeball these windows,
decontamination audits grep them, and annotation pipelines ship them as
labeling units.

Distributed shape: MAP-ONLY, zero shuffles (the chunking.py recipe) — one
tokenize, a posexplode over hit positions, a codegen `slice` back into the
same row's token array.  The token array is materialized as a named column
BEFORE the lambda touches it (the Catalyst rule pinned in README: lambdas
re-evaluate non-trivial subtrees).  Cost is linear in hits, not in
documents × window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens


def kwic(
    df: DataFrame,
    id_col: str,
    text_col: str,
    term: str,
    window: int = 3,
) -> DataFrame:
    """(id, hit_pos, snippet, n_tokens): one row per case-insensitive hit
    of ``term`` as a whole token; hit_pos is 0-based; the snippet is the
    space-joined ±window tokens clamped at the document edges."""
    tk = tokens(F.lower(F.col(text_col)))
    start = F.greatest(F.col("hit_pos") + 1 - window, F.lit(1))
    end = F.least(F.col("hit_pos") + 1 + window, F.size(F.col("_tk")))
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), tk.alias("_tk"))
        .select(
            id_col,
            "_tk",
            F.posexplode(F.col("_tk")).alias("hit_pos", "_tok"),
        )
        .where(F.col("_tok") == term.lower())
        .select(
            id_col,
            F.col("hit_pos").cast("long").alias("hit_pos"),
            F.array_join(
                F.slice(F.col("_tk"), start, end - start + 1), " "
            ).alias("snippet"),
            F.size(F.col("_tk")).cast("long").alias("n_tokens"),
        )
    )
