"""SparkSession factory with the engine's standard configuration.

Local mode is the test/bench harness; the same configs are what we would
submit with ``spark-submit --conf`` on a real cluster (AQE, skew-join
handling, Arrow batching). See SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size bounds per-batch memory inside mapInPandas; at 100 TB the
# payload column dominates, so we bound by record count and rely on the
# upstream chunking of oversized payloads (plans/extract_pipeline.py).
ARROW_MAX_RECORDS_PER_BATCH = "2048"


def get_spark(
    app_name: str = "document_extraction_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the driver's bench harness controls parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local threads == cores; match shuffle width to them (guide: not 200)
        n = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            ARROW_MAX_RECORDS_PER_BATCH,
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def ensure_worker_package(spark: SparkSession) -> None:
    """Idempotent: make this package importable on executor Python workers.

    Called defensively by every operator that runs Python on workers
    (mapInPandas / pandas_udf), so the engine works under ANY SparkSession —
    including harnesses that build their own session without --py-files."""
    _ship_package(spark)


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (the programmatic
    equivalent of ``spark-submit --py-files pkg.zip`` from the north rule).

    Without this, ``mapInPandas`` kernels fail to unpickle on workers
    whenever the driver's cwd isn't the repo root."""
    import shutil
    import tempfile

    if getattr(spark, "_dex_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # the package is ALREADY running from a zip (spark-submit --py-files):
        # executors get the same zip through the submit mechanism, and there
        # is no directory to re-stage — copytree on a zip path would crash
        spark._dex_pkg_shipped = True
        return
    tmp = tempfile.mkdtemp(prefix="dex_pyfiles_")
    zip_base = os.path.join(tmp, "document_extraction_spark")
    # zip root must contain the package dir itself
    staged = os.path.join(tmp, "stage", "document_extraction_spark")
    shutil.copytree(pkg_dir, staged, ignore=shutil.ignore_patterns("__pycache__"))
    zip_path = shutil.make_archive(zip_base, "zip", os.path.join(tmp, "stage"))
    spark.sparkContext.addPyFile(zip_path)
    spark._dex_pkg_shipped = True
