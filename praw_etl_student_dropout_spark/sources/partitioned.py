"""Hive-partitioned fixture layouts (SURVEY.md §2.1 S6 + §4 DPP).

The driver fixtures are single parquet files, so partition-aware physical
optimizations (static partition pruning, dynamic partition pruning, scan
parallelism from the directory layout) never fire against them. This
module materializes a deterministic partitioned copy of a fixture table
— the layout a 100 TB warehouse would actually use (facts partitioned by
a coarse time key) — so those code paths are exercised and asserted.

The copy is written once per (sf_dir, table, key) under the repo-local
scratch dir and reused; rewriting only happens if the marker file is
missing. Derivation is pure (year(o_orderdate)), so the copy is a
function of the fixture content and safe to cache across sessions.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .readers import load_tables


def _scratch_root() -> Path:
    """Repo-local ``.scratch`` (gitignored); temp-dir fallback when the
    package is imported from a read-only location (e.g. a shipped zip)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return Path(env)
    repo = Path(__file__).resolve().parents[2]
    if repo.is_dir() and os.access(repo, os.W_OK):
        return repo / ".scratch"
    return Path(tempfile.gettempdir()) / "spark_graft_scratch"


def ensure_orders_by_year(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``orders`` partitioned by ``o_year`` and return its path.

    Layout: ``.../orders_by_year/o_year=1995/part-*.parquet``. One file
    per partition at fixture scale (coalesce(1) per year via a single
    repartition on the key); at warehouse scale the same writer shape
    fans out to one directory per year with many files each.
    """
    dest = _scratch_root() / "part" / Path(sf_dir).name / "orders_by_year"
    marker = dest / "_SUCCESS"
    if not marker.exists():
        orders = load_tables(spark, sf_dir, ["orders"])["orders"]
        (
            orders.withColumn("o_year", F.year("o_orderdate"))
            .repartition("o_year")
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(str(dest))
        )
    return str(dest)


def read_orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-discovered scan of the partitioned copy; ``o_year`` is a
    partition column, so equality/IN predicates on it prune directories
    before any row is read (PartitionFilters in the scan node)."""
    return spark.read.parquet(ensure_orders_by_year(spark, sf_dir))
