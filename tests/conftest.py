from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def testdata_dir():
    """Root of the driver-generated parquet tables; overridable via
    SPARK_GRAFT_TESTDATA. Data-dependent tests skip (not error) when the
    dataset is absent so the suite runs on any machine (ADVICE r4)."""
    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    if not os.path.isdir(root):
        pytest.skip(f"testdata root {root} not present on this machine")
    return root


@pytest.fixture(scope="session")
def spark():
    from document_extraction_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
