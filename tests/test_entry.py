"""Contract tests for __spark_entry__ (driver smoke + oracle coverage)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    names = [f.name for f in df.schema.fields]
    for col in ["conv_id", "turn_idx", "text", "spans", "parse_failed"]:
        assert col in names


def test_oracle_keys_subset_of_queries():
    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(os_) <= set(qs)
    # SQL-expressible queries (q_*) all carry oracles; x_* are rows-only
    for name in qs:
        if name.startswith("q_"):
            assert name in os_, f"{name} missing oracle"


def test_queries_run_at_sf0001(spark, testdata_dir):
    """Every query executes and yields a stable schema at the smallest SF."""
    sf = f"{testdata_dir}/sf0.001"
    for name, fn in E.queries().items():
        df = fn(spark, sf)
        assert df.columns, name
        df.limit(1).collect()
