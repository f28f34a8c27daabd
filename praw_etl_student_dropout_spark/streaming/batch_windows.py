"""Event-time window aggregates, batch mode (SURVEY.md §2.10 ST3/ST4).

``window()`` / ``session_window()`` in a plain groupBy — the exact
aggregation the streaming jobs run incrementally, so batch results double
as the oracle-checkable truth for the streaming pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(df: DataFrame, ts_col: str, duration: str, keys: list[str]) -> DataFrame:
    """ST3 — non-overlapping event-time windows; epoch-aligned starts."""
    w = F.window(ts_col, duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "cnt", "sum_value")
    )


def sliding_agg(df: DataFrame, ts_col: str, duration: str, slide: str) -> DataFrame:
    """ST3 — overlapping windows (each event in duration/slide windows)."""
    w = F.window(ts_col, duration, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )


def session_agg(df: DataFrame, ts_col: str, gap: str, keys: list[str]) -> DataFrame:
    """ST4 — dynamic session windows: events merge while consecutive gaps
    are < ``gap``; the window extends ``gap`` past the last event."""
    w = F.session_window(ts_col, gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(*keys, F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def trending_topk(
    df: DataFrame, ts_col: str, duration: str, key: str, k: int = 3
) -> DataFrame:
    """ST3+W1 — per-window trending keys: tumbling counts ranked inside
    each window, top-k kept. The rank partitions on the WINDOW (bounded
    frame: one row per distinct key per window), so the window function
    never sees the event stream itself."""
    from pyspark.sql import Window

    counts = (
        df.groupBy(F.window(ts_col, duration).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), key, "cnt")
    )
    r = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc(key))
    )
    return counts.withColumn("trend_rank", r).filter(F.col("trend_rank") <= k)


def ohlc_agg(df: DataFrame, ts_col: str = "ts", duration: str = "1 hour") -> DataFrame:
    """Batch twin of :func:`stream_jobs.ohlc_stream` — per (event_type,
    window) OHLC bars (t7_ohlc_bars' shape on the window() key so the
    streamed and batch frames compare row-for-row). open/close pick by
    the (ts, event_id) total order via min_by/max_by — one hash
    aggregation, no window function, map-side partials."""
    w = F.window(ts_col, duration)
    key = F.struct(ts_col, "event_id")
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open_val"),
            F.max("value").alias("high_val"),
            F.min("value").alias("low_val"),
            F.max_by("value", key).alias("close_val"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "open_val", "high_val", "low_val", "close_val",
            "n_events",
        )
    )


def cusum_fold(
    daily: DataFrame,
    key: str,
    slack: float,
    threshold: float,
    day_col: str = "d",
    cents_col: str = "cents",
) -> DataFrame:
    """Shared CUSUM fold over a (key, day, integer-cents) daily table —
    the one implementation both the graded batch twin
    (``st11_cusum_batch``) and the streaming job
    (``stream_jobs.cusum_stream``) call, so streamed==batch holds by
    construction once the daily state matches. Closed-form rewrite of
    S_t = max(0, S_{t-1} + z_t - slack): prefix sum of (z - slack)
    minus its own running prefix min (clamped at 0), two running
    windows over the key×calendar domain — nothing sequential. z
    standardizes each day against the key's own mean/std from power
    sums in dollars (w18's discipline: cents² would overflow int64)."""
    from pyspark.sql import Window

    from ..plans.cache_registry import track

    # stats and the z projection both read the daily rollup; in the
    # graded batch entry that rollup is a data-sized events scan —
    # persist it (tracked). The streaming caller passes a domain-sized
    # micro-batch frame, where the persist is merely cheap.
    daily = track(daily)
    dollars = F.col(cents_col) / F.lit(100.0)
    stats = daily.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dollars).alias("s1"),
        F.sum(dollars * dollars).alias("s2"),
    )
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    z = daily.join(F.broadcast(stats), key).select(
        key,
        day_col,
        ((dollars - F.col("s1") / F.col("n")) / sigma).alias("zt"),
    )
    wrun = (
        Window.partitionBy(key)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = z.select(
        key, day_col, F.sum(F.col("zt") - F.lit(slack)).over(wrun).alias("pt")
    )
    s = p.select(
        key,
        day_col,
        "pt",
        F.least(F.min("pt").over(wrun), F.lit(0.0)).alias("mn"),
    )
    return (
        s.filter(F.col("pt") - F.col("mn") > threshold)
        .select(
            key,
            F.col(day_col).cast("timestamp").alias("day"),
            F.round(F.col("pt") - F.col("mn"), 4).alias("cusum"),
        )
    )
