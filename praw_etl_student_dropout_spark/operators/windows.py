"""Window operators (SURVEY.md §2.5 W1-W3, §2.6 T1-T4).

The reference has no window functions; these are the engine's scalable
forms of its top-1/limit patterns (idxmax etl_pipeline.py:197-198;
sort='new' limit=1000 etl_pipeline.py:48). A window shuffles once on its
partition key; per-group top-k never collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """W1/T4 — row_number ≤ k per group. ``order_by`` must be a total
    order (include a unique tiebreak column) for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """T3 — ORDER BY ... LIMIT k (the extract's sort='new' limit cap,
    etl_pipeline.py:48). Physically TakeOrderedAndProject: each partition
    keeps k rows, only k·partitions rows reach the driver-side merge."""
    return df.orderBy(*order_by).limit(k)


def with_lag(df: DataFrame, partition_by: list[str], order_by: list[Column], col: str, name: str = "prev") -> DataFrame:
    """W2 — lag(col) per partition in order."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, F.lag(col).over(w))


def running_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    agg_col: str,
    name: str = "running_sum",
) -> DataFrame:
    """W3 — frame-spec running sum (unbounded preceding → current row)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(name, F.sum(agg_col).over(w))
