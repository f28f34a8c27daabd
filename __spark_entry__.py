"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``praw_etl_student_dropout_spark``; this file
only adapts the catalog registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

_pkg_shipped = False


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable inside Python UDF workers.

    Driver-side sys.path does NOT propagate to executor Python processes,
    so any pandas_udf/mapInPandas query fails with ModuleNotFoundError
    when the driver runs from a cwd other than the repo root. Shipping a
    package zip via addPyFile puts it on every worker's sys.path."""
    global _pkg_shipped
    if _pkg_shipped:
        return
    import tempfile
    import zipfile

    pkg = "praw_etl_student_dropout_spark"
    zpath = os.path.join(tempfile.gettempdir(), f"{pkg}_shipped.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        root = os.path.join(_REPO_DIR, pkg)
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, _REPO_DIR))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect sessions without an SC; workers then
        # rely on PYTHONPATH, which pytest/repo-root runs already have
    _pkg_shipped = True


def _ensure_conf(spark: SparkSession) -> None:
    """Confs the engine needs on a driver-provided session (the fixture
    events table stores TIMESTAMP(NANOS); UTC keeps year()/date_trunc()
    agreeing with the oracle)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # one-file-per-bucket tables (j18 / write_bucketed) carry usable
        # sortBy order only under this flag; purely an optimization —
        # results identical without it
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
    except Exception:
        pass  # immutable conf on some deployments; session.get_spark sets it
    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's star join + pivot, etl_pipeline.py:
    144-149,183) on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    from praw_etl_student_dropout_spark.plans.flagship import flagship_star_pivot

    return flagship_star_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from praw_etl_student_dropout_spark.plans import catalog_all

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in catalog_all().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_conf(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(spec.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (oracle=None) are
    non-SQL-expressible ops the driver checks rows-only."""
    from praw_etl_student_dropout_spark.plans import catalog_all

    return {name: spec.oracle for name, spec in catalog_all().items() if spec.oracle is not None}
