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


def distributed_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_name: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY ...)`` WITHOUT the
    single-partition window Spark compiles that to.

    ``repartitionByRange`` on the order gives every partition a contiguous
    slice of the global order; a per-partition row_number (ordinary
    partitioned window) plus an exclusive prefix sum of the per-partition
    COUNTS (≤ one row per partition — tiny by construction) broadcast back
    yields the exact global rank. ``order_by`` must be a total order
    (include a unique tiebreak) for a deterministic result.

    Rank arithmetic is exact in BIGINT; the helper columns are dropped.
    NOTE: the result references its input twice in the logical plan (main
    + counts branch) — do not CHAIN several of these over one frame; use
    :func:`distributed_ntile_multi`, which melts all metrics into one
    pass, or the plan size compounds exponentially.
    """
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *order_by)
    else:
        part = df.repartitionByRange(*order_by)
    part = part.withColumn("_drn_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_drn_pid").orderBy(*order_by)
    local = part.withColumn("_drn_local", F.row_number().over(local_w).cast("long"))
    counts = local.groupBy("_drn_pid").agg(F.count(F.lit(1)).alias("_drn_cnt"))
    # One row per partition: this window's frame is the partition COUNT,
    # not the data size — the only safe unpartitioned window shape.
    offset_w = Window.orderBy("_drn_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_drn_pid",
        F.coalesce(F.sum("_drn_cnt").over(offset_w), F.lit(0)).alias("_drn_off"),
    )
    ranked = local.join(F.broadcast(offsets), "_drn_pid").withColumn(
        rank_name, (F.col("_drn_local") + F.col("_drn_off")).cast("long")
    )
    return ranked.drop("_drn_pid", "_drn_local", "_drn_off")


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: list[Column],
    tile_name: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``ntile(n) OVER (ORDER BY ...)`` without a single-partition
    window: :func:`distributed_row_number` plus closed-form tile math.

    ntile semantics: with N rows, the first ``N % n`` tiles hold
    ``N div n + 1`` rows, the rest ``N div n``. The tile of global rank k
    is pure arithmetic once N is known (one scalar, broadcast). Division
    happens in DOUBLE then floors — exact while N < 2^53 rows, far past
    any realistic frame.
    """
    ranked = distributed_row_number(df, order_by, "_dnt_rank", num_partitions)
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("_dnt_n"))
    ranked = ranked.join(F.broadcast(total))
    k = F.col("_dnt_rank")
    q = F.floor(F.col("_dnt_n") / n_tiles).cast("long")
    r = (F.col("_dnt_n") % n_tiles).cast("long")
    big = q + F.lit(1)
    cut = r * big  # rows covered by the first r (larger) tiles
    tile = F.when(k <= cut, F.floor((k + q) / big)).otherwise(
        r + F.floor((k - cut + q - F.lit(1)) / q)
    )
    return ranked.withColumn(tile_name, tile.cast("int")).drop("_dnt_rank", "_dnt_n")


def distributed_ntile_multi(
    df: DataFrame,
    n_tiles: int,
    metrics: list[tuple[str, Column]],
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Several global ntiles over the SAME frame in ONE pass of the
    prefix-sum machinery — the shape :func:`distributed_ntile` chained
    per metric cannot give (each chain level re-references its input in
    the logical plan, compounding plan size exponentially).

    ``metrics`` is ``[(name, sort_value)]`` where ``sort_value`` is an
    exactly-ordered ASCENDING bigint expression (negate for descending;
    ``unix_micros`` for timestamps). The frame is melted to one row per
    (row, metric), range-partitioned on (metric, value, id) so every
    partition holds a contiguous slice of each metric's global order,
    ranked per (metric, partition) with a broadcast prefix-sum of the
    per-(metric, partition) counts, tile-assigned by closed-form ntile
    arithmetic, and pivoted back to one tile column per metric. Two wide
    shuffles total (range + pivot groupBy) regardless of metric count.
    ``order`` within a metric must be total: ``id_col`` is the tiebreak.
    """
    melted = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("_m"), expr.cast("long").alias("_v")
                    )
                    for name, expr in metrics
                ]
            )
        ).alias("_mv"),
    ).select(id_col, F.col("_mv._m").alias("_m"), F.col("_mv._v").alias("_v"))
    if num_partitions:
        part = melted.repartitionByRange(num_partitions, "_m", "_v", id_col)
    else:
        part = melted.repartitionByRange("_m", "_v", id_col)
    part = part.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_m", "_pid").orderBy("_v", id_col)
    local = part.withColumn("_lrn", F.row_number().over(local_w).cast("long"))
    counts = local.groupBy("_m", "_pid").agg(F.count(F.lit(1)).alias("_c"))
    # ≤ metrics × partitions rows: windows below are tiny by construction.
    off_w = Window.partitionBy("_m").orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_m",
        "_pid",
        F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_c").over(Window.partitionBy("_m")).alias("_n"),
    )
    ranked = local.join(F.broadcast(offsets), ["_m", "_pid"])
    k = F.col("_lrn") + F.col("_off")
    q = F.floor(F.col("_n") / n_tiles).cast("long")
    r = (F.col("_n") % n_tiles).cast("long")
    big = q + F.lit(1)
    cut = r * big
    tile = F.when(k <= cut, F.floor((k + q) / big)).otherwise(
        r + F.floor((k - cut + q - F.lit(1)) / q)
    )
    tiles = ranked.select(id_col, "_m", tile.cast("int").alias("_t"))
    return tiles.groupBy(id_col).pivot("_m", [name for name, _ in metrics]).agg(
        F.first("_t")
    )


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
