"""Set operators & exact dedup (SURVEY.md §2.7 D1, D2, D4).

The reference accumulates 119 per-query result lists into one
(etl_pipeline.py:44-57) guarded by a ``seen_ids`` set (D2). Spark forms:
union is plan-level (zero cost until an action); dedup is a shuffle on
the dedup key with map-side partial dedup first.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """D1 — union by column name (etl_pipeline.py:44-57's accumulation).
    ``unionByName`` so column order differences across branches are safe."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def dedup_by_key(df: DataFrame, keys: list[str], tiebreak: list[Column] | None = None) -> DataFrame:
    """D2 — exact dedup (seen_ids etl_pipeline.py:41,49-50; INSERT IGNORE
    etl_pipeline.py:122).

    With ``tiebreak`` the survivor per key is deterministic (row_number=1
    in tiebreak order — SURVEY §7 watch-list: which duplicate wins must
    be explicit in a distributed engine). Without it, ``dropDuplicates``
    (cheaper: partial dedup map-side, arbitrary survivor).
    """
    if tiebreak is None:
        return df.dropDuplicates(keys)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def intersect_keys(a: DataFrame, b: DataFrame) -> DataFrame:
    """D4 — INTERSECT (distinct semantics)."""
    return a.intersect(b)


def except_keys(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """D4 — EXCEPT / EXCEPT ALL."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
