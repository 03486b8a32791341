from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_extraction_spark.core.normalize import fence_strip_one
from document_extraction_spark.operators.structured import (
    fence_strip_col,
    schema_from_example,
    structured_extract,
)


def test_schema_from_example_types(spark):  # DDL parse needs an active context
    s = schema_from_example(
        {"name": "", "count": 0, "score": 0.0, "ok": True,
         "tags": [""], "nested": {"a": 0}, "missing": None}
    )
    assert isinstance(s, T.StructType)
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["name"] == T.StringType()
    assert by_name["count"] == T.LongType()
    assert by_name["score"] == T.DoubleType()
    assert by_name["ok"] == T.BooleanType()
    assert by_name["tags"] == T.ArrayType(T.StringType(), True)
    assert by_name["nested"] == T.StructType([T.StructField("a", T.LongType(), True)])
    assert by_name["missing"] == T.StringType()
    # DDL string and DataType pass through
    assert schema_from_example("k BIGINT, v STRING") == T.StructType(
        [T.StructField("k", T.LongType(), True), T.StructField("v", T.StringType(), True)]
    )
    assert schema_from_example(T.LongType()) == T.LongType()


def test_fence_strip_col_differential(spark):
    """JVM fence strip must replicate the reference slice semantics
    (extractor.py:112-118) byte-for-byte — the Python scalar is the oracle."""
    cases = [
        '```json\n{"a": 1}\n```',
        '```\n{"a": 1}\n```',
        '  ```json{"a":1}```  ',
        '{"a": 1}',
        "```json only prefix",
        "x```",
        "``` ```",
        "```json```",
        "",
        "   ",
        "```jsonx```",   # the 7-char slice eats "x"? no: startswith ```json -> drop 7 -> "x```" -> trailing strip
        "plain text no fences",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "t"])
    got = {r["i"]: r["s"] for r in df.select("i", fence_strip_col(F.col("t")).alias("s")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == fence_strip_one(c), (i, c, got[i], fence_strip_one(c))


def test_structured_extract_null_for_missing(spark):
    """The reference's contract (extractor.py:106): information not found ->
    null. from_json gives exactly that for schema fields absent from the
    payload."""
    rows = [
        (0, '{"title": "Invoice 7", "total": 12.5}'),
        (1, '```json\n{"title": "Receipt"}\n```'),       # total missing -> null
        (2, '{"total": 3.0, "extra_ignored": "x"}'),      # title missing -> null
        (3, "not json at all"),                           # degrade, never crash
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc", "payload"])
    out = {
        r["doc"]: r
        for r in structured_extract(
            df, {"title": "", "total": 0.0}, payload_col="payload"
        ).collect()
    }
    assert out[0]["title"] == "Invoice 7" and out[0]["total"] == 12.5
    assert out[1]["title"] == "Receipt" and out[1]["total"] is None
    assert out[2]["title"] is None and out[2]["total"] == 3.0
    assert not out[0]["parse_failed"] and not out[1]["parse_failed"]
    # malformed -> all fields null, flagged, row preserved
    assert out[3]["parse_failed"] is True
    assert out[3]["title"] is None and out[3]["total"] is None
    # empty/null payloads are not "failures"
    assert out[4]["parse_failed"] is False and out[5]["parse_failed"] is False


def test_structured_extract_nested_and_arrays(spark):
    df = spark.createDataFrame(
        [(0, '{"who": {"name": "ada"}, "tags": ["a", "b"], "n": 3}')],
        ["doc", "payload"],
    )
    out = structured_extract(
        df, {"who": {"name": ""}, "tags": [""], "n": 0}, payload_col="payload"
    ).collect()[0]
    assert out["who"]["name"] == "ada"
    assert out["tags"] == ["a", "b"]
    assert out["n"] == 3


def test_structured_extract_rejects_scalar_schema(spark):
    df = spark.createDataFrame([(0, "{}")], ["doc", "payload"])
    with pytest.raises(ValueError, match="object schema"):
        structured_extract(df, 0, payload_col="payload")


def test_reference_readme_type_hint_schema(spark):
    """The reference's documented schema vocabulary (README.md:153-172):
    leaf values are type-hint strings like "number" and
    "string (format JJ/MM/AAAA)" — they must derive real types, and the
    documented invoice example must round-trip with numeric fields typed."""
    from pyspark.sql import types as T

    ref_schema = {
        "numero_facture": "string",
        "date": "string (format JJ/MM/AAAA)",
        "client": {"nom": "string", "adresse": "string"},
        "lignes": [
            {"description": "string", "quantite": "number", "prix_unitaire": "number"}
        ],
        "total_ht": "number",
        "tva": "number",
        "total_ttc": "number",
    }
    st = schema_from_example(ref_schema)
    assert isinstance(st["total_ht"].dataType, T.DoubleType)
    line = st["lignes"].dataType.elementType
    assert isinstance(line["quantite"].dataType, T.DoubleType)
    assert isinstance(st["date"].dataType, T.StringType)

    payload = (
        '{"numero_facture": "FAC-2024-001234", "date": "15/03/2024",'
        ' "client": {"nom": "Entreprise ABC", "adresse": "123 rue Example"},'
        ' "lignes": [{"description": "Prestation", "quantite": 5,'
        ' "prix_unitaire": 500.0}],'
        ' "total_ht": 2500.0, "tva": 500.0, "total_ttc": 3000.0}'
    )
    df = spark.createDataFrame([(0, payload)], ["doc", "payload"])
    row = structured_extract(df, ref_schema, payload_col="payload").collect()[0]
    assert row["total_ttc"] == 3000.0
    assert row["lignes"][0]["quantite"] == 5.0
    assert row["client"]["nom"] == "Entreprise ABC"
    # example VALUES (not hints) still map to plain strings
    assert isinstance(schema_from_example({"x": "Acme"})["x"].dataType, T.StringType)
