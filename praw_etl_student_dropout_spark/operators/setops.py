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


def dedup_by_key(
    df: DataFrame,
    keys: list[str],
    tiebreak: list[Column | str] | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """D2 — exact dedup (seen_ids etl_pipeline.py:41,49-50; INSERT IGNORE
    etl_pipeline.py:122).

    With ``tiebreak`` the survivor per key is the row with the smallest
    tiebreak tuple (ascending lexicographic — must be a total order for
    determinism; SURVEY §7 watch-list). Two physical strategies:

    - ``"agg"`` (default): ``min_by`` over a struct — ONE shuffle with
      map-side partial aggregation (physically SortAggregate: the struct
      buffer is not hash-aggregable, but the partial/final split holds),
      so a hot key is reduced to one row per input partition before the
      exchange. Skew-immune; the right default for INSERT-IGNORE-style
      loads where duplicate ratios are high and unpredictable.
    - ``"window"``: row_number over (keys, tiebreak) — shuffles and
      sorts every duplicate into one reducer per key. Measurably faster
      when keys are near-unique (no reduction for partial agg to win),
      but a hot key serializes into a single task at scale.

    Without ``tiebreak``: ``dropDuplicates`` (arbitrary survivor).
    """
    if tiebreak is None:
        return df.dropDuplicates(keys)
    tb_cols = [F.col(c) if isinstance(c, str) else c for c in tiebreak]
    if strategy == "window":
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(*tb_cols)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    order_key = F.struct(*tb_cols)
    rest = [c for c in df.columns if c not in keys]
    winner = F.min_by(F.struct(*[F.col(c) for c in rest]), order_key).alias("__row")
    return (
        df.groupBy(*keys)
        .agg(winner)
        .select(*keys, *[F.col("__row")[c].alias(c) for c in rest])
        .select(*df.columns)
    )


def intersect_keys(a: DataFrame, b: DataFrame) -> DataFrame:
    """D4 — INTERSECT (distinct semantics)."""
    return a.intersect(b)


def except_keys(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """D4 — EXCEPT / EXCEPT ALL."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
