"""Winnowing fingerprints (operators/winnow.py): the SIGMOD-2003 guarantee
(shared substrings >= k+w-1 produce identical selected fingerprints),
rightmost-tie-break determinism, short-doc handling, and the Spark/DuckDB
twin agreement that backs the r7 oracle entry."""

from __future__ import annotations

import duckdb
import pandas as pd

from document_extraction_spark.operators.winnow import (
    sql_winnow_fingerprints,
    winnow_fingerprints,
)


def _rows(df):
    return {(r["doc_id"], r["pos"], r["fp"]) for r in df.collect()}


def test_shared_substring_guarantee(spark):
    # docs share a 40-char span (>= k + w - 1 = 11): at least one selected
    # fingerprint must be identical (same fp value, any positions)
    shared = "the quick brown fox jumps over the lazy"
    docs = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB ending one"),
            (2, f"completely different head {shared} zzz"),
            (3, "no overlap with anything else at all here"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared span must produce a common fingerprint"
    assert not (fps[3] & (fps[1] | fps[2]))


def test_selection_density_and_determinism(spark):
    text = "abcdefghijklmnopqrstuvwxyz0123456789" * 8
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = _rows(winnow_fingerprints(docs))
    b = _rows(winnow_fingerprints(docs.repartition(5)))
    assert a == b and a
    # winnowing keeps roughly 2/(w+1) of grams; loosely bound it
    n_grams = len(text) - 7
    assert len({(p, f) for (_, p, f) in a}) <= n_grams // 2


def test_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "exactly8!"), (3, None)],
        "doc_id long, text string",
    )
    out = _rows(winnow_fingerprints(docs))
    ids = {d for (d, _, _) in out}
    assert 1 not in ids and 3 not in ids  # < k chars / null -> absent
    assert 2 in ids                        # one gram, one window


def test_twin_agreement(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river"),
        (2, "the  QUICK   brown fox!  jumps over a sleepy cat by the road"),
        (3, "short one"),
        (4, "abcabcabcabcabcabc repeated content abcabcabc tie breaks"),
        (5, None),
    ]
    sdf = (
        winnow_fingerprints(
            spark.createDataFrame(rows, "doc_id long, text string")
        )
        .orderBy("doc_id", "pos", "fp")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ddf = con.execute(sql_winnow_fingerprints()).df()
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    for col in sdf.columns:
        assert list(sdf[col]) == list(ddf[col]), col


def test_hash_array_not_reevaluated_in_selection(spark):
    """Plan pin for the r6 lesson: the md5 gram-hash transform must be
    materialized BEHIND the localCheckpoint barrier — if it leaks into the
    window-selection projection, Catalyst inlines it into every lambda
    reference (minutes per doc at a 2000-char prefix).  The executed plan
    downstream of the barrier must contain no md5 call."""
    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz" * 4)], "doc_id long, text string"
    )
    plan = (
        winnow_fingerprints(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the selection runs over "Scan ExistingRDD" (the checkpoint barrier);
    # md5 must not appear anywhere in this downstream plan
    assert "ExistingRDD" in plan
    assert "md5" not in plan
