"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
2003 — the MOSS algorithm): hash every k-char gram of the normalized text,
slide a w-hash window, and keep each window's minimum hash (rightmost on
ties).  The guarantee: any shared substring of length >= k + w - 1 between
two documents yields at least one IDENTICAL selected fingerprint — the
local, position-aware dedup/plagiarism primitive that whole-doc md5 and
MinHash (set-level) cannot provide.

Distributed shape: fingerprint selection is ENTIRELY map-side — char grams,
hashes, window minima and tie-breaks are array higher-order functions over
a bounded text prefix; the only shuffle is whatever the caller does with
the (doc_id, pos, fp) rows (e.g. a groupBy(fp) to find cross-doc matches,
which carries selected fingerprints only — a ~2/(w+1) fraction of grams).

The prefix cap (MAX_CHARS, the lm_score.py recipe) both bounds monster-row
skew and sidesteps the quadratic char-indexed-substr trap pinned in
PLANS.md: inside an array lambda each substring re-scans from the string
head, so cost is O(prefix^2 / k) — fine at 2000 chars, catastrophic
uncapped.

Determinism / oracle story: gram hash = hexint13(md5(gram)) (the cms.py
exact-integer convention); window argmin with RIGHTMOST tie-break is pure
integer logic — the DuckDB twin (list comprehensions + list_position on the
reversed window) reproduces every selected (pos, fp) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_GRAM = 8      # guarantee floor: matches shorter than k never fingerprint
WINDOW = 4      # any match of length >= k + w - 1 = 11 is caught
MAX_CHARS = 2000


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = WINDOW,
    max_chars: int = MAX_CHARS,
) -> DataFrame:
    """(doc_id, pos, fp): winnowing-selected fingerprints; ``pos`` is the
    1-based gram offset in the normalized prefix, ``fp`` the exact-integer
    gram hash.  Documents whose normalized prefix is shorter than ``k``
    have no grams and are absent."""
    # \s+ collapse: Java \s includes U+000B (vertical tab) while DuckDB's
    # RE2 \s does not — the twin agreement therefore ASSUMES a no-VT corpus
    # (ADVICE r6; true of the driver's synthetic tables and of any corpus
    # that ran the extraction normalizer, which maps control whitespace
    # first).  Changing the class here would change q_winnow's frozen
    # oracle, so the assumption is documented rather than patched this
    # round; q_lexical_diversity shares the same convention.
    norm = F.trim(
        F.regexp_replace(F.lower(F.substring(F.col(text_col), 1, max_chars)),
                         r"\s+", " ")
    )
    d = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), norm.alias("_t"))
        .where(F.length("_t") >= k)
    )
    # hashes[i] = hexint13(md5(gram_i)), one entry per k-gram of the prefix
    # (expr form: F.substring takes int start, lambdas need a Column start)
    d = d.withColumn(
        "_h",
        F.expr(
            f"transform(sequence(1, length(_t) - {k - 1}), "
            f"i -> cast(conv(substring(md5(substring(_t, i, {k})), 1, 13), "
            f"16, 10) as bigint))"
        ),
    )
    # HARD barrier: the window-selection lambdas below reference _h several
    # times per window; Catalyst inlines the md5-transform definition into
    # EVERY lambda reference (no CSE into lambdas — PLANS.md rule 1), which
    # re-hashes the whole gram array per window: measured minutes/doc at a
    # 2000-char prefix. localCheckpoint materializes the hash array once;
    # still no shuffle (partition-local), same recipe as the dedup CC loop.
    d = d.select(id_col, "_h").localCheckpoint(eager=False)
    # window j (1-based) covers _h[j .. j+w-1]; rightmost-min selection:
    # pos = j + w' - position_of_min_in_reversed_window (w' = actual window
    # width, shorter at the tail never happens because j stops at m-w+1;
    # when m < w there is ONE window over all m grams)
    d = d.withColumn(
        "_sel",
        F.expr(
            f"transform(sequence(1, greatest(size(_h) - {w - 1}, 1)), "
            f"j -> named_struct("
            f"  'pos', j + size(slice(_h, j, {w})) "
            f"         - array_position(reverse(slice(_h, j, {w})), "
            f"                          array_min(slice(_h, j, {w}))), "
            f"  'fp', array_min(slice(_h, j, {w}))))"
        ),
    )
    return (
        d.select(id_col, F.explode("_sel").alias("s"))
        .select(
            id_col,
            F.col("s.pos").cast("long").alias("pos"),
            F.col("s.fp").alias("fp"),
        )
        .dropDuplicates([id_col, "pos", "fp"])
    )


def sql_winnow_fingerprints(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = WINDOW,
    max_chars: int = MAX_CHARS,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints`."""
    return f"""
        WITH norm AS (
          SELECT {id_col},
                 trim(regexp_replace(lower(substr({text_col}, 1, {max_chars})),
                                     '\\s+', ' ', 'g')) AS t
          FROM {table} WHERE {text_col} IS NOT NULL),
        ok AS (SELECT {id_col}, t FROM norm WHERE length(t) >= {k}),
        hashed AS (
          SELECT {id_col},
                 [('0x' || substr(md5(substr(t, i, {k})), 1, 13))::BIGINT
                  for i in range(1, length(t) - {k - 1} + 1)] AS h
          FROM ok),
        sel AS (
          SELECT {id_col},
                 unnest([{{'pos': j + len(list_slice(h, j, j + {w} - 1))
                                 - list_position(list_reverse(
                                       list_slice(h, j, j + {w} - 1)),
                                   list_min(list_slice(h, j, j + {w} - 1))),
                           'fp': list_min(list_slice(h, j, j + {w} - 1))}}
                         for j in range(1, greatest(len(h) - {w - 1}, 1) + 1)])
                   AS s
          FROM hashed)
        SELECT DISTINCT {id_col}, (s.pos)::BIGINT AS pos, s.fp AS fp
        FROM sel
        ORDER BY {id_col}, pos, fp
    """
