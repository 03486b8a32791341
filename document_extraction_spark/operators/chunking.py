"""Sliding token-window chunking: documents -> overlapping fixed-size token
chunks — the step that turns curated documents into training/RAG units.

Every long-context pipeline needs this shape: window W tokens, stride S < W
so consecutive chunks overlap by W-S (context continuity at chunk seams).
Deterministic, purely positional — no RNG, no model.

Plan shape at 100 TB: MAP-ONLY. Tokenize (array HOF) -> per-doc chunk count
(arithmetic) -> ``posexplode(sequence)`` fan-out -> ``slice`` + ``array_join``
per chunk, all inside whole-stage codegen; zero shuffles, so the operator
runs at scan speed and parallelism is entirely the scan's. Each output row
carries its (doc_id, chunk_idx) key, so downstream packing/shuffling is
free to move chunks independently — the same per-unit statelessness
argument as extraction's per-turn keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import tokens


def sliding_token_chunks(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk, n_tok): overlapping ``window``-token chunks
    every ``stride`` tokens, whitespace-tokenized. A document with <= window
    tokens (including an empty one) yields exactly one chunk; the final
    chunk is the (possibly short) tail. Chunks overlap by ``window -
    stride`` tokens."""
    if not 1 <= stride <= window:
        raise ValueError(
            f"need 1 <= stride <= window, got stride={stride} window={window}"
        )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    k = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int") + 1
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_tk"),
        F.posexplode(F.sequence(F.lit(0), k - 1)).alias("chunk_idx", "_i"),
    )
    piece = F.slice(F.col("_tk"), F.col("chunk_idx") * stride + 1, window)
    return base.select(
        "doc_id",
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("long").alias("n_tok"),
    )
