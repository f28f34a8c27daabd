"""Aggregation operators (SURVEY.md §2.4 A1-A11).

All Catalyst aggregates: partial (map-side) + final (post-shuffle)
combine is automatic, so a groupBy on 100 TB shuffles only the partial
aggregate state, not the rows. The reference computed these with pandas
groupby/pivot/value_counts (etl_pipeline.py:163,173,183,194-198) and
re-scanned the frame five times for its insight block — ``insight_summary``
below is the single-pass form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, *keys: str, name: str = "cnt") -> DataFrame:
    """A1/A2 — GROUP BY count (sentiment distribution etl_pipeline.py:163;
    year × dropout etl_pipeline.py:173)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(name))


def pivot_count(
    df: DataFrame,
    row_key: str,
    pivot_key: str,
    pivot_values: list[str],
    fill: int = 0,
) -> DataFrame:
    """A3 — groupBy().pivot().count() semantics with zero-fill
    (etl_pipeline.py:183), compiled as conditional aggregation.

    ``pivot_values`` is explicit (SURVEY §7 watch-list): the output schema
    is fixed even when a bucket is empty. With the values known, a
    count-if per value in ONE groupBy beats ``.pivot()`` — Spark plans
    pivot as two aggregates around two exchanges (pre-agg on (row, pivot)
    then pivot_first), while this is a single shuffle with map-side
    partial counts and zero-fill for free (count never returns null).
    """
    counts = [
        F.count(F.when(F.col(pivot_key) == v, 1)).alias(str(v)) for v in pivot_values
    ]
    out = df.groupBy(row_key).agg(*counts)
    if fill != 0:
        # pivot's null (absent combo) is count 0 here; honor a non-zero fill
        out = out.select(
            row_key,
            *[
                F.when(F.col(str(v)) == 0, F.lit(fill))
                .otherwise(F.col(str(v)))
                .alias(str(v))
                for v in pivot_values
            ],
        )
    return out


def mode_of(df: DataFrame, key: str, count_name: str = "cnt") -> DataFrame:
    """A7 — top-1 group (value_counts().idxmax(), etl_pipeline.py:197-198)
    with a deterministic tiebreak on the key itself (idxmax takes the
    first seen; distributed engines need the tiebreak explicit)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.desc(count_name), F.asc(key))
        .limit(1)
    )


def distinct_values(df: DataFrame, *keys: str) -> DataFrame:
    """A8 — distinct (df['col'].unique(), etl_pipeline.py:96,104)."""
    return df.select(*keys).distinct()


def insight_summary(df: DataFrame, label_col: str, flag_col: str, year_col: str, group_col: str) -> DataFrame:
    """A4-A6 single-pass — the reference's five insight scalars
    (etl_pipeline.py:194-198) computed in ONE scan instead of five:
    total rows, flag sum, neutral percentage. (Top-1 year/group are
    separate grouped queries — see ``mode_of``.)
    """
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.col(flag_col).cast("int")).alias("flag_count"),
        F.round(F.avg(F.when(F.col(label_col) == "neutral", 1.0).otherwise(0.0)) * 100, 2).alias("neutral_pct"),
    )


def grouped_rollup(df: DataFrame, keys: list[str], aggs: list[F.Column]) -> DataFrame:
    """A10 — ROLLUP hierarchy totals (subtotals + grand total)."""
    return df.rollup(*keys).agg(*aggs)


def grouped_cube(df: DataFrame, keys: list[str], aggs: list[F.Column]) -> DataFrame:
    """A10 — CUBE over all key combinations."""
    return df.cube(*keys).agg(*aggs)


def approx_distinct(df: DataFrame, key: str, rsd: float = 0.01) -> DataFrame:
    """A11 — HyperLogLog++ distinct estimate. At 100 TB this is THE
    distinct-count: fixed-size sketch state per partition instead of a
    giant exact-distinct shuffle."""
    return df.agg(F.approx_count_distinct(key, rsd).alias("approx_distinct"))
