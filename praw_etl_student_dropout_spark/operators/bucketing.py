"""Bucketed (co-located) tables — the shuffle-elimination path for
repeated large⨯large joins (SURVEY.md §2.3 J4 at scale).

A plain equi-join of two fact-sized tables shuffles BOTH sides every
query. Writing each side bucketed (and sorted) by the join key pins rows
to hash buckets at write time; Spark's bucketed scan then feeds a
sort-merge join with ZERO exchanges — the per-query shuffle is paid once,
at load. At 100 TB this converts the dominant recurring cost of a
fact-to-fact join (e.g. orders ⋈ lineitem on orderkey) into a one-time
layout decision, and composes with partition pruning (partitionBy date,
bucketBy key).

Bucket counts must match (or divide) across join sides; keep them a
power of two so a table can be re-bucketed coarser without a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int = 32,
    sort_keys: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. ``sort_keys`` default to the bucket keys — sorted buckets
    let the sort-merge join skip its sort as well."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*(sort_keys or bucket_keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same keys/bucket count: the plan is exchange-free (asserted in
    tests/test_plans.py). Any extra filters/projections compose on the
    returned DataFrame and still prune the bucketed scan."""
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)
