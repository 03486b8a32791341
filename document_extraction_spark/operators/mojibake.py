"""Encoding-damage (mojibake) QC: per-document counts of the classic
UTF-8-mangling artifacts a crawl pipeline filters on — replacement
characters (U+FFFD, a decoder already gave up), Latin-1-misdecoded UTF-8
telltales ('â€'-family punctuation, 'Ã'+mangled-Latin-letter digraphs,
'Â'+NBSP), and raw C0 control bytes — plus the non-ASCII ratio that
contextualizes them.

Everything is regexp_count / length over the text column: map-only
whole-stage codegen, ZERO shuffles, runs at scan speed at any corpus size.
Counts are integers and the ratio is one rounded division, so every row
hash-verifies against the DuckDB twin (regex patterns restricted to the
Java/RE2 common subset, the textstats.scrub_pii rule; hex escapes only —
no raw control bytes in source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java + RE2 common-subset patterns (no lookarounds, no \p classes).
# â€ = 'â€' (mangled smart punctuation), Ã + mangled Latin
# letter = 'Ã©'-family, Â  = 'Â' + NBSP.
RE_REPLACEMENT = "�"
RE_MOJIBAKE = (
    "â€"
    "|Ã[©¨¤¶¼±§£¯´]"
    "|Â "
)
RE_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
RE_NON_ASCII = "[^\\x00-\\x7f]"


def encoding_qc(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_replacement, n_mojibake, n_ctrl, n_nonascii,
    nonascii_ratio, enc_ok) for every document with text.

    ``enc_ok`` is the keep verdict: no replacement chars, no mojibake
    telltales, no control bytes."""
    c = F.col(text_col)
    out = df.where(c.isNotNull()).select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars"),
        F.regexp_count(c, F.lit(RE_REPLACEMENT)).cast("long").alias("n_replacement"),
        F.regexp_count(c, F.lit(RE_MOJIBAKE)).cast("long").alias("n_mojibake"),
        F.regexp_count(c, F.lit(RE_CTRL)).cast("long").alias("n_ctrl"),
        F.regexp_count(c, F.lit(RE_NON_ASCII)).cast("long").alias("n_nonascii"),
    )
    return out.select(
        "*",
        F.round(
            F.col("n_nonascii") / F.greatest(F.col("n_chars"), F.lit(1)), 4
        ).alias("nonascii_ratio"),
        (
            (F.col("n_replacement") == 0)
            & (F.col("n_mojibake") == 0)
            & (F.col("n_ctrl") == 0)
        ).alias("enc_ok"),
    )


def sql_encoding_qc(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`encoding_qc` (same regex literals)."""
    c = text_col
    return f"""
        WITH base AS (
          SELECT {id_col},
                 length({c})::BIGINT AS n_chars,
                 len(regexp_extract_all({c}, '{RE_REPLACEMENT}'))::BIGINT AS n_replacement,
                 len(regexp_extract_all({c}, '{RE_MOJIBAKE}'))::BIGINT AS n_mojibake,
                 len(regexp_extract_all({c}, '{RE_CTRL}'))::BIGINT AS n_ctrl,
                 len(regexp_extract_all({c}, '{RE_NON_ASCII}'))::BIGINT AS n_nonascii
          FROM {table} WHERE {c} IS NOT NULL)
        SELECT *,
               round(n_nonascii::DOUBLE / greatest(n_chars, 1), 4) AS nonascii_ratio,
               (n_replacement = 0 AND n_mojibake = 0 AND n_ctrl = 0) AS enc_ok
        FROM base ORDER BY {id_col}
    """
