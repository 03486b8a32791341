"""Structured schema-by-example extraction (operator for the reference's
second mode, /root/reference/src/pdf_extractor/extractor.py:76-132).

The reference sends a user-supplied JSON schema (an example-shaped dict) to
the VLM, fence-strips the response, and ``json.loads`` it — any information
not found must be null (extractor.py:106 "Si une information n'est pas
trouvée, utilise null"). The Spark-native analogue, all JVM-side:

* :func:`schema_from_example` — turn the user's example dict into a Spark
  ``StructType`` at runtime (the "schema-by-example" contract: values carry
  the expected types).
* :func:`fence_strip_col` — Column twin of the reference's markdown-fence
  slice semantics (extractor.py:112-118, same slices as
  core/normalize.fence_strip_one) — differentially tested against the Python
  scalar in tests/test_structured.py.
* :func:`structured_extract` — fence strip -> ``from_json`` with the derived
  schema. Missing keys become NULL fields (native ``from_json`` semantics ==
  the reference's null-for-missing instruction); malformed JSON degrades to
  ``parse_failed=true`` with NULL fields instead of the reference's uncaught
  ``json.loads`` crash (extractor.py:120) — no row is ever lost.

Scale: pure Column expressions + ``from_json`` — map-only, whole-stage
codegen, zero Python, no shuffle. The user schema is resolved once on the
driver; executors see a constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_from_example(example) -> T.DataType:
    """Derive a Spark schema from a JSON example value (dict -> struct,
    list -> array, scalars by Python type; None -> string). Accepts an
    already-built DataType or a DDL string unchanged."""
    if isinstance(example, T.DataType):
        return example
    if isinstance(example, str) and not isinstance(example, bool):
        # a bare string argument is a DDL schema ("k BIGINT, label STRING")
        return T._parse_datatype_string(example)
    return _type_of(example)


# The reference documents schemas whose LEAF VALUES are type-hint strings —
# "number", "string", "string (format JJ/MM/AAAA)" (README.md:153-172), not
# example values. Map that vocabulary to real types; any other string (an
# actual example value) stays a string.
_TYPE_HINTS = {
    "number": T.DoubleType(),
    "string": T.StringType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
}


def _type_of(v) -> T.DataType:
    if isinstance(v, bool):  # bool before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _type_of(x), nullable=True) for k, x in v.items()]
        )
    if isinstance(v, (list, tuple)):
        elem = _type_of(v[0]) if len(v) else T.StringType()
        return T.ArrayType(elem, containsNull=True)
    if isinstance(v, str):
        # reference type-hint vocabulary: first word decides ("string
        # (format JJ/MM/AAAA)" -> string)
        head = v.strip().split(" ")[0].split("(")[0].lower()
        return _TYPE_HINTS.get(head, T.StringType())
    return T.StringType()  # None, anything else


_WS_EDGE = r"^\s+|\s+$"


def fence_strip_col(col: Column) -> Column:
    """JVM-side markdown fence strip with the reference's exact slice
    semantics: strip, drop leading \\`\\`\\`json (7 chars), then leading
    \\`\\`\\` (3, evaluated on the previous step's result), then trailing
    \\`\\`\\`, strip again. Cheap codegen'd string ops; the nested ``when``
    chain duplicates only trims."""
    t0 = F.regexp_replace(col, _WS_EDGE, "")
    t1 = F.when(t0.startswith("```json"), t0.substr(F.lit(8), F.length(t0))).otherwise(t0)
    t2 = F.when(t1.startswith("```"), t1.substr(F.lit(4), F.length(t1))).otherwise(t1)
    t3 = F.when(
        t2.endswith("```"), t2.substr(F.lit(1), F.length(t2) - 3)
    ).otherwise(t2)
    return F.regexp_replace(t3, _WS_EDGE, "")


def structured_extract(
    df: DataFrame,
    schema,
    payload_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Extract typed fields from a JSON-bearing payload column according to a
    runtime user schema (example dict, DDL string, or StructType).

    Output: ``keep_cols`` + one column per top-level schema field (NULL when
    missing or unparseable) + ``parse_failed`` (true iff the payload was
    non-empty but not valid JSON for the schema).
    """
    struct_schema = schema_from_example(schema)
    if not isinstance(struct_schema, T.StructType):
        raise ValueError(
            f"structured_extract needs an object schema at the top level, got "
            f"{struct_schema.simpleString()}"
        )
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != payload_col
    ]
    # separate select steps: the cleaned payload is referenced twice below
    # (from_json + the parse_failed predicate) — materialize it as a named
    # column so Catalyst doesn't duplicate the strip chain
    cleaned = df.select(
        *keep, fence_strip_col(F.col(payload_col)).alias("_cleaned")
    )
    # PERMISSIVE from_json yields an ALL-NULL struct for malformed input —
    # indistinguishable from valid JSON with every field absent. The corrupt-
    # record column disambiguates: non-null iff the payload failed to parse.
    parse_schema = T.StructType(
        list(struct_schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = cleaned.select(
        *keep,
        "_cleaned",
        F.from_json(
            F.col("_cleaned"),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_parsed"),
    )
    return parsed.select(
        *keep,
        *[F.col(f"_parsed.{f.name}").alias(f.name) for f in struct_schema.fields],
        (
            F.col("_parsed._corrupt").isNotNull()
            & F.col("_cleaned").isNotNull()
            & (F.length("_cleaned") > 0)
        ).alias("parse_failed"),
    )
