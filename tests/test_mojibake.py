"""Encoding-damage QC (operators/mojibake.py): replacement chars, mojibake
telltales, control bytes, and the legit-non-ASCII pass-through — plus the
Spark/DuckDB twin agreement on a damaged corpus."""

from __future__ import annotations

import duckdb
import pandas as pd

from document_extraction_spark.operators.mojibake import (
    encoding_qc,
    sql_encoding_qc,
)

DOCS = [
    (1, "clean ascii text only"),
    (2, "smart quote gone wrong: â€™ and â€œquoted spanâ€"),
    (3, "café is perfectly fine — naïve, söupçon"),     # legit non-ASCII
    (4, "decoder gave up here: ��"),
    (5, "binary sneaked in: ctrl\x01byte\x1f tail"),
    (6, "JoÃ£o lives in SÃ£o Paulo"),                    # Ã£ digraphs
    (7, "hard spaceÂ damage"),
    (8, None),
]


def test_flags_and_passthrough(spark):
    out = {r["doc_id"]: r for r in
           encoding_qc(spark.createDataFrame(DOCS, "doc_id long, text string"))
           .collect()}
    assert 8 not in out  # null text absent
    assert out[1]["enc_ok"] and out[1]["n_nonascii"] == 0
    assert not out[2]["enc_ok"] and out[2]["n_mojibake"] >= 3
    assert out[3]["enc_ok"] and out[3]["n_nonascii"] >= 4  # legit accents pass
    assert not out[4]["enc_ok"] and out[4]["n_replacement"] == 2
    assert not out[5]["enc_ok"] and out[5]["n_ctrl"] == 2
    assert not out[6]["enc_ok"] and out[6]["n_mojibake"] == 2
    assert not out[7]["enc_ok"] and out[7]["n_mojibake"] == 1


def test_twin_agreement_on_damaged_corpus(spark):
    """The DuckDB twin produces identical rows on the same frame — the
    cross-engine contract the r7 oracle entry will rely on."""
    sdf = encoding_qc(
        spark.createDataFrame(DOCS, "doc_id long, text string")
    ).orderBy("doc_id").toPandas()
    pdf = pd.DataFrame([d for d in DOCS], columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    ddf = con.execute(sql_encoding_qc()).df()
    assert list(sdf.columns) == list(ddf.columns)
    for col in sdf.columns:
        assert list(sdf[col]) == list(ddf[col]), col
