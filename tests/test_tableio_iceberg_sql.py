"""Dry validation of the Iceberg statement builders (VERDICT r3 ask #8):
this sandbox ships no iceberg-spark-runtime jar, so the catalog branches of
TableIO.upsert/compact can't execute — pin the exact SQL text they emit so
the unexercisable branch can't rot silently. No SparkSession needed."""

from __future__ import annotations

import pytest

from document_extraction_spark.sources.tableio import (
    iceberg_compact_sql,
    iceberg_merge_sql,
)


def test_merge_sql_single_key():
    got = iceberg_merge_sql("lake.docs", "_upsert_src_docs", ["doc_id"])
    assert got == (
        "MERGE INTO lake.docs t USING _upsert_src_docs s "
        "ON t.doc_id <=> s.doc_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_sql_composite_key_null_safe():
    got = iceberg_merge_sql("lake.turns", "src", ["conv_id", "turn_idx"])
    # composite keys AND-ed, null-safe comparison so a NULL key component
    # matches its own prior row instead of silently double-inserting
    assert "ON t.conv_id <=> s.conv_id AND t.turn_idx <=> s.turn_idx" in got
    assert got.index("WHEN MATCHED THEN UPDATE SET *") < got.index(
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_sql_requires_keys():
    with pytest.raises(ValueError, match="key"):
        iceberg_merge_sql("lake.t", "src", [])


def test_compact_sql_binpack_call():
    got = iceberg_compact_sql("lake", "docs")
    assert got == (
        "CALL lake.system.rewrite_data_files(table => 'docs', "
        "strategy => 'binpack', "
        "options => map('target-file-size-bytes', '536870912'))"
    )
    # target size is a knob (file size ~ scan parallelism at 100 TB)
    assert "'134217728'" in iceberg_compact_sql("lake", "docs", 128 * 1024 * 1024)
