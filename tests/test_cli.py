from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.cli import make_parser, parse_pages, run_cli, validate
from document_extraction_spark.plans.extract_pipeline import build_extract_df
from document_extraction_spark.sources.transcripts import write_transcripts_parquet


def test_parse_pages_reference_semantics():
    # reference main.py:56-63: comma list, inclusive ranges, mixed
    assert parse_pages("0,1,2") == [0, 1, 2]
    assert parse_pages("0-5") == [0, 1, 2, 3, 4, 5]
    assert parse_pages("0,3-5,7") == [0, 3, 4, 5, 7]
    assert parse_pages("4") == [4]
    assert parse_pages(" 1 , 2-3 ") == [1, 2, 3]


@pytest.mark.parametrize("bad", ["", "1,", "a", "1-b", "3-1", "-2", "1-2-3"])
def test_parse_pages_rejects(bad):
    with pytest.raises(ValueError):
        parse_pages(bad)


def test_validate_catches_config_errors(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    parser = make_parser()

    def v(argv):
        return validate(parser.parse_args(argv))

    base = [str(src), "--dst", str(tmp_path / "out")]
    assert v(base) is None
    assert "not found" in v(["/nonexistent", "--dst", "x"])
    assert "partitions" in v(base + ["--partitions", "0"])
    assert "max-payload-chars" in v(base + ["--max-payload-chars", "-1"])
    assert "reversed" in v(base + ["--pages", "5-2"])
    bad_schema = tmp_path / "s.json"
    bad_schema.write_text("[1, 2]")
    assert "JSON object" in v(base + ["--schema", str(bad_schema)])
    bad_schema.write_text("{nope")
    assert "invalid JSON" in v(base + ["--schema", str(bad_schema)])


def test_pages_filter_is_pushed_to_scan(spark, tmp_path):
    """The --pages predicate must reach the parquet scan (the reference
    rasterizes everything then drops pages; we never read the other turns)."""
    src = str(tmp_path / "t")
    write_transcripts_parquet(src, n_convs=4, seed=7, rows_per_file=100)
    df = spark.read.parquet(src)
    plan = build_extract_df(
        df, turn_filter=F.col("turn_idx").isin(parse_pages("0-2"))
    )
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in physical and "turn_idx" in physical.split("PushedFilters")[1][:200]


def test_cli_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "t")
    dst = str(tmp_path / "out")
    write_transcripts_parquet(src, n_convs=3, seed=11, rows_per_file=60)
    rc = run_cli([src, "--dst", dst, "--pages", "0-3", "--master", "local[4]"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "extract" and metrics["n_turns"] > 0
    out = spark.read.parquet(dst)
    assert out.select(F.max("turn_idx")).collect()[0][0] <= 3
    assert out.count() == metrics["n_turns"]


def test_cli_structured_mode(spark, tmp_path, capsys):
    src = str(tmp_path / "tj")
    dst = str(tmp_path / "outj")
    rows = [
        ("c0", 0, "user", None, None, '{"title": "Doc A", "total": 5.0}'),
        ("c0", 1, "user", None, None, '```json\n{"title": "Doc B"}\n```'),
        ("c0", 2, "user", None, None, "not json"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp, text string"
    )
    df.write.parquet(src)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({"title": "", "total": 0.0}))
    rc = run_cli([src, "--dst", dst, "--schema", str(schema_file), "--master", "local[4]"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "structured" and metrics["n_turns"] == 3
    out = {r["turn_idx"]: r for r in spark.read.parquet(dst).collect()}
    assert out[0]["title"] == "Doc A" and out[0]["total"] == 5.0
    assert out[1]["title"] == "Doc B" and out[1]["total"] is None  # null-for-missing
    assert out[2]["parse_failed"] is True


def test_cli_config_error_exit_code(tmp_path):
    rc = run_cli(["/nonexistent", "--dst", str(tmp_path / "o")])
    assert rc == 2


def test_cli_metrics_single_scan(spark, tmp_path):
    """Metrics ride the write pass via df.observe — the CLI plan must contain
    exactly one parquet FileScan (round 2 re-read the output, a second full
    pass over the corpus)."""
    from document_extraction_spark.cli import attach_metrics

    src = str(tmp_path / "t1scan")
    write_transcripts_parquet(src, n_convs=2, seed=5, rows_per_file=50)
    out = build_extract_df(spark.read.parquet(src))
    observed, obs = attach_metrics(out, structured=False)
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    observed.write.mode("overwrite").parquet(str(tmp_path / "o1scan"))
    got = obs.get
    assert got["n_turns"] > 0 and got["bytes_in"] > 0 and got["bytes_out"] > 0
    assert got["n_turns"] == spark.read.parquet(str(tmp_path / "o1scan")).count()


def test_cli_structured_nested_schema(spark, tmp_path, capsys):
    """Structured mode with the reference README's nested schema-by-example
    shape (README.md:153-199): arrays of objects, nested nulls-for-missing.
    Exercised through the real CLI surface end-to-end."""
    src = str(tmp_path / "tn")
    dst = str(tmp_path / "outn")
    rows = [
        ("c0", 0, "user", None, None,
         '{"invoice": {"number": "F-1", "customer": {"name": "Acme"}},'
         ' "lines": [{"desc": "widget", "qty": 2, "price": 9.5},'
         ' {"desc": "gadget", "qty": 1, "price": 20.0}]}'),
        # fenced + missing the lines array entirely -> null, not []
        ("c0", 1, "user", None, None,
         '```json\n{"invoice": {"number": "F-2", "customer": {}}}\n```'),
        # array present, inner object field missing -> null inside the struct
        ("c0", 2, "user", None, None,
         '{"invoice": {"number": "F-3", "customer": {"name": null}},'
         ' "lines": [{"desc": "lone"}]}'),
        ("c0", 3, "user", None, None, "{definitely not json"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp, text string"
    )
    df.write.parquet(src)
    schema_file = tmp_path / "nested_schema.json"
    schema_file.write_text(json.dumps({
        "invoice": {"number": "", "customer": {"name": ""}},
        "lines": [{"desc": "", "qty": 0, "price": 0.0}],
    }))
    rc = run_cli([src, "--dst", dst, "--schema", str(schema_file), "--master", "local[4]"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "structured" and metrics["n_turns"] == 4
    assert metrics["n_parse_failed"] == 1
    out = {r["turn_idx"]: r for r in spark.read.parquet(dst).collect()}
    assert out[0]["invoice"]["number"] == "F-1"
    assert out[0]["invoice"]["customer"]["name"] == "Acme"
    assert [tuple(ln) for ln in out[0]["lines"]] == [
        ("widget", 2, 9.5), ("gadget", 1, 20.0)]
    assert out[1]["invoice"]["number"] == "F-2"
    assert out[1]["invoice"]["customer"]["name"] is None  # nested null-for-missing
    assert out[1]["lines"] is None                        # absent array -> null
    assert out[2]["lines"][0]["desc"] == "lone"
    assert out[2]["lines"][0]["qty"] is None              # missing in array element
    assert out[2]["lines"][0]["price"] is None
    assert out[3]["parse_failed"] is True
    assert out[3]["invoice"] is None
