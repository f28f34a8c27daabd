"""Streaming invariants (SURVEY.md §5.3, §2.10 ST1-ST5): streamed window
aggregates agree with their batch-mode twins (the oracle-checked truth);
stateful dedup collapses replayed input; foreachBatch append is idempotent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.sources.readers import load_tables
from praw_etl_student_dropout_spark.streaming.batch_windows import session_agg, tumbling_agg
from praw_etl_student_dropout_spark.streaming.stream_jobs import (
    deduped_stream,
    foreach_batch_idempotent_append,
    read_event_stream,
    run_available_now,
    sessionized_stream,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Landing-zone copy of the events fixture (streaming file source needs
    a directory; the fixture parquet is a single TIMESTAMP(NANOS) file the
    batch loader normalizes to micros first)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_tables(spark, sf_dir, ["events"])["events"].write.parquet(path)
    return path


def _drain(spark, stream_df, tmp_path, name, mode):
    run_available_now(stream_df, str(tmp_path / f"ckpt_{name}"), name, output_mode=mode)
    return spark.table(name)


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_stream_matches_batch(spark, events_dir, sf_dir, tmp_path):
    batch = tumbling_agg(
        load_tables(spark, sf_dir, ["events"])["events"], "ts", "1 hour", ["event_type"]
    )
    streamed = _drain(
        spark,
        tumbling_counts_stream(read_event_stream(spark, events_dir)),
        tmp_path,
        "tumbling_complete",
        "complete",
    )
    # complete mode emits every window regardless of watermark → exact match
    assert _as_set(streamed) == _as_set(batch)


def test_tumbling_stream_append_is_subset_of_batch(spark, events_dir, sf_dir, tmp_path):
    batch = tumbling_agg(
        load_tables(spark, sf_dir, ["events"])["events"], "ts", "1 hour", ["event_type"]
    )
    streamed = _drain(
        spark,
        tumbling_counts_stream(read_event_stream(spark, events_dir)),
        tmp_path,
        "tumbling_append",
        "append",
    )
    # append mode only emits windows the watermark has closed — a subset,
    # and every emitted row is final (identical to the batch value)
    assert _as_set(streamed) <= _as_set(batch)


def test_session_stream_matches_batch(spark, events_dir, sf_dir, tmp_path):
    batch = session_agg(
        load_tables(spark, sf_dir, ["events"])["events"], "ts", "30 minutes", ["user_id"]
    ).select("user_id", "session_start", "n_events")
    streamed = _drain(
        spark,
        sessionized_stream(read_event_stream(spark, events_dir), gap="30 minutes"),
        tmp_path,
        "session_complete",
        "complete",
    )
    assert _as_set(streamed) == _as_set(batch)


def test_deduped_stream_collapses_replay(spark, sf_dir, tmp_path):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    replay_dir = str(tmp_path / "replayed")
    events.write.parquet(replay_dir)  # file 1
    events.write.mode("append").parquet(replay_dir)  # file 2: full replay
    n_distinct = events.select("event_id").distinct().count()
    streamed = _drain(
        spark,
        deduped_stream(read_event_stream(spark, replay_dir)),
        tmp_path,
        "dedup_stream",
        "append",
    )
    assert streamed.count() == n_distinct
    assert streamed.select("event_id").distinct().count() == n_distinct


def test_foreach_batch_append_is_idempotent(spark, events_dir, tmp_path):
    target = str(tmp_path / "sink")
    for attempt in ("c1", "c2"):
        # second pass = fresh checkpoint → full reprocess of the same input;
        # the anti-join must suppress every duplicate (INSERT IGNORE parity)
        foreach_batch_idempotent_append(
            read_event_stream(spark, events_dir),
            keys=["event_id"],
            target_path=target,
            checkpoint_dir=str(tmp_path / attempt),
        )
    sunk = spark.read.parquet(target)
    n_src = spark.read.parquet(events_dir).count()
    assert sunk.count() == n_src
    assert sunk.select("event_id").distinct().count() == n_src


def test_watermark_drops_late_rows_across_batches(spark, sf_dir, tmp_path):
    """ST2 — a row arriving in a later micro-batch, with event time older
    than (max seen ts - watermark), must be dropped from a watermarked
    aggregation in append mode."""
    from datetime import datetime

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    base = datetime(2024, 6, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, t, 1, "click", 1.0, "{}") for i, t in rows], schema
        )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        # file sink (memory sink can't recover from a checkpoint, and the
        # point here is resuming state across two runs)
        stream = tumbling_counts_stream(
            read_event_stream(spark, in_dir, schema=mk([]).schema),
            watermark="1 hour",
            duration="1 hour",
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: events at 10:00 and 14:00 → watermark advances to 13:00
    mk([(1, base), (2, base.replace(hour=14))]).write.parquet(in_dir)
    drain()
    # batch 2: a late event at 10:30 — older than the 13:00 watermark
    mk([(3, base.replace(minute=30))]).write.mode("append").parquet(in_dir)
    drain()
    emitted = spark.read.parquet(out_dir)
    ten_oclock = {
        r.cnt
        for r in emitted.collect()
        if r.window_start.hour == 10 and r.window_start.minute == 0
    }
    # the 10:00 window finalized with ONLY event 1; the late event never
    # re-opened it (bounded state: the INSERT-IGNORE-forever alternative
    # would hold every window open indefinitely)
    assert ten_oclock == {1}


def test_stateful_user_stats_accumulates_across_batches(spark, sf_dir, tmp_path):
    """ST-custom — applyInPandasWithState keeps per-user state across
    micro-batches: with maxFilesPerTrigger=1 the two input files arrive in
    separate batches, and the LAST emitted row per user must equal the
    all-data batch aggregate."""
    from praw_etl_student_dropout_spark.streaming.stream_jobs import stateful_user_stats

    events = load_tables(spark, sf_dir, ["events"])["events"]
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    in_dir = str(tmp_path / "in")
    half1.write.parquet(in_dir)
    half2.write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode re-emits a user each batch they appear in; keep the last
    emitted = spark.table("user_stats").collect()
    final = {}
    for r in emitted:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, round(r.sum_value, 6))
    expected = {
        r.user_id: (r.n, round(r.s, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == expected


def test_stream_stream_interval_join_matches_batch(spark, events_dir, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        attributed_purchases_stream,
    )

    streamed = _drain(
        spark,
        attributed_purchases_stream(read_event_stream(spark, events_dir)),
        tmp_path,
        "ss_join",
        "append",
    )
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    batch = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        F.round("amount", 2).alias("amount"),
    )
    assert streamed.count() > 0
    assert _as_set(streamed) == _as_set(batch)


def test_stream_static_enrichment_matches_batch(spark, events_dir, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        enriched_events_stream,
    )

    dim = spark.createDataFrame(
        [("click", 2.0), ("purchase", 10.0), ("view", 0.5)],
        "event_type string, weight double",
    )
    streamed = _drain(
        spark,
        enriched_events_stream(read_event_stream(spark, events_dir), dim),
        tmp_path,
        "ss_enrich",
        "append",
    )
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    batch = ev.join(F.broadcast(dim), "event_type", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.round(
            F.col("value") * F.coalesce(F.col("weight"), F.lit(1.0)), 6
        ).alias("weighted_value"),
    )
    assert streamed.count() == ev.count()  # left join keeps every event
    assert _as_set(streamed) == _as_set(batch)


def test_update_mode_merge_upsert_converges_to_batch(spark, events_dir, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.operators.merge import read_merged
    from praw_etl_student_dropout_spark.streaming.stream_jobs import run_update_merge

    base = str(tmp_path / "merged_counts")
    agg = tumbling_counts_stream(read_event_stream(spark, events_dir))
    run_update_merge(
        agg, base, str(tmp_path / "ckpt_merge"), keys=["window_start", "event_type"]
    )
    # replay the same input: update-mode re-emissions must be absorbed by
    # the upsert, not appended
    run_update_merge(
        agg, base, str(tmp_path / "ckpt_merge2"), keys=["window_start", "event_type"]
    )
    merged = read_merged(spark, base)
    batch = tumbling_agg(
        load_tables(spark, sf_dir, ["events"])["events"], "ts", "1 hour", ["event_type"]
    )
    assert _as_set(merged) == _as_set(batch)


def test_streaming_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.operators.sketches import cms_build
    from praw_etl_student_dropout_spark.sources.readers import load_tables
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        read_event_stream,
        streaming_cms,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    # Split events into two "arrival" files so the stream sees >=1 batch
    src = tmp_path / "incoming"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = read_event_stream(spark, str(src), schema=events.schema)
    sketch_path = str(tmp_path / "sketch")
    streaming_cms(
        stream, "user_id", sketch_path, str(tmp_path / "ckpt"), depth=4, width=256
    )
    got = sorted(
        ((r.sketch_row, r.bucket), r.cnt)
        for r in spark.read.parquet(sketch_path).collect()
    )
    want = sorted(
        ((r.sketch_row, r.bucket), r.cnt)
        for r in cms_build(events, "user_id", depth=4, width=256).collect()
    )
    assert got == want


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.sources.readers import load_tables
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        attributed_purchases_stream,
        read_event_stream,
        run_available_now,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    src = tmp_path / "incoming"
    events.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = read_event_stream(spark, str(src), schema=events.schema)
    outer = attributed_purchases_stream(stream, how="left_outer")
    run_available_now(outer, str(tmp_path / "ckpt"), "outer_join")
    got = spark.table("outer_join")
    inner_ids = {
        r.purchase_id
        for r in got.filter(F.col("click_id").isNotNull())
        .select("purchase_id")
        .collect()
    }
    null_rows = got.filter(F.col("click_id").isNull()).collect()
    # Outer rows are purchases with NO click in the horizon; they must
    # not also appear matched, and must exist for this fixture (most
    # purchases have no same-user click within 30 minutes)
    assert null_rows, "expected watermark-expired unmatched purchases"
    assert all(r.purchase_id not in inner_ids for r in null_rows)
    # Batch cross-check: every emitted unmatched purchase is genuinely
    # unmatched in the batch interval join
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    matched_batch = {
        r.purchase_id
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
            ),
            "left_semi",
        ).collect()
    }
    assert all(r.purchase_id not in matched_batch for r in null_rows)


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """ST-custom (Spark 4 transformWithStateInPandas) — per-user value
    state accumulated across two micro-batches must equal the all-data
    batch aggregate. Requires the RocksDB state store provider, and
    protobuf for the worker<->state-server protocol (absent in some
    environments, hence the guard — the applyInPandasWithState test
    above covers the same state contract everywhere)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs the protobuf package for "
        "the Python worker <-> state-server protocol (pyspark/sql/streaming/"
        "proto/StateMessage_pb2.py imports google.protobuf at run time). "
        "This container has no protobuf and no network; environments with "
        "protobuf installed run this test unmodified — no other gate. The "
        "applyInPandasWithState twin above asserts the identical "
        "state-accumulation contract without protobuf.",
    )
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        stateful_user_stats_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = load_tables(spark, sf_dir, ["events"])["events"].filter(
            F.col("user_id") < 20
        )
        in_dir = str(tmp_path / "in")
        events.filter(F.col("event_id") % 2 == 0).write.parquet(in_dir)
        events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(in_dir)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            stateful_user_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("user_stats_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Memory-sink row order across batches is an implementation
        # detail; state is monotonically cumulative, so the final state
        # per user is the row with max n_events — never collect() order.
        final = {}
        for r in spark.table("user_stats_tws").collect():
            if r.user_id not in final or r.n_events > final[r.user_id][0]:
                final[r.user_id] = (r.n_events, round(r.sum_value, 6))
        expected = {
            r.user_id: (r.n, round(r.s, 6))
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
            .collect()
        }
        assert final == expected
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_span_screen_stream_matches_batch_and_resumes(spark, sf_dir, tmp_path):
    """Streaming span screen == the batch incremental operator on the
    same split, and a checkpointed re-run (same dir, no new files)
    appends nothing — the index carries the state, the checkpoint
    carries progress."""
    from praw_etl_student_dropout_spark.operators.dedup import (
        shared_span_pairs_incremental,
        winnowed_fingerprints,
    )
    from praw_etl_student_dropout_spark.schemas import DOCUMENTS
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        span_screen_stream,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    new_docs = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    prints = winnowed_fingerprints(corpus, "text", "doc_id", k=8, w=4).persist()
    try:
        batch_expect = {
            (r.new_id, r.corpus_id, r.n_shared_fps)
            for r in shared_span_pairs_incremental(
                new_docs, prints, k=8, w=4, min_shared=2
            ).collect()
        }
        arriving = str(tmp_path / "arriving")
        # two files → the file source can split them across triggers
        half = new_docs.filter(F.col("doc_id") % 22 == 0)
        other = new_docs.filter(F.col("doc_id") % 22 != 0)
        half.write.parquet(arriving)
        other.write.mode("append").parquet(arriving)
        target = str(tmp_path / "flagged")
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema(DOCUMENTS).parquet(arriving)
        span_screen_stream(stream, prints, target, ckpt, k=8, w=4, min_shared=2)
        got = {
            (r.new_id, r.corpus_id, r.n_shared_fps)
            for r in spark.read.parquet(target).collect()
        }
        assert got == batch_expect and got
        # resume with the same checkpoint: nothing new → nothing appended
        stream2 = spark.readStream.schema(DOCUMENTS).parquet(arriving)
        span_screen_stream(stream2, prints, target, ckpt, k=8, w=4, min_shared=2)
        assert spark.read.parquet(target).count() == len(got)
    finally:
        prints.unpersist()


def test_trending_stream_matches_batch(spark, events_dir, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.streaming.batch_windows import trending_topk
    from praw_etl_student_dropout_spark.streaming.stream_jobs import trending_stream

    batch = trending_topk(
        load_tables(spark, sf_dir, ["events"])["events"], "ts", "1 hour", "event_type", k=3
    )
    trending_stream(
        read_event_stream(spark, events_dir),
        "trending_sink",
        str(tmp_path / "ckpt_trending"),
        k=3,
    )
    streamed = spark.table("trending_sink")
    assert _as_set(streamed) == _as_set(batch)
    # every window emits exactly its top-3 (or fewer if fewer keys)
    per_window = streamed.groupBy("window_start").count().collect()
    assert all(r["count"] <= 3 for r in per_window)


def test_rate_limited_stream_enforces_quota_across_batches(spark, sf_dir, tmp_path):
    """ST8 streaming twin: per-(user, day) quota state carries across
    micro-batches. Split events at the global ts median so every key's
    arrival follows event time -> the accepted SET equals the batch
    twin's first-by-ts choice; the per-key accepted COUNT invariant
    (min(quota, seen)) holds regardless."""
    import time as _time

    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        rate_limited_stream,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    # split on ts order: first half = earliest-half timestamps
    ordered = events.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    df1 = spark.createDataFrame(ordered[:half], events.schema)
    df2 = spark.createDataFrame(ordered[half:], events.schema)
    in_dir = str(tmp_path / "in")
    df1.coalesce(1).write.parquet(in_dir)
    _time.sleep(1.1)  # distinct mod-times: file order == event-time order
    df2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    accepted_path = str(tmp_path / "accepted")
    rate_limited_stream(
        stream,
        accepted_path,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        quota=3,
        granularity="day",
    )
    got = spark.read.parquet(accepted_path)

    from pyspark.sql import Window

    w = Window.partitionBy("user_id", F.date_trunc("day", F.col("ts"))).orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    batch_twin = (
        events.select(
            "event_id",
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("window_start"),
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
    # ordered arrival -> exact set equality with the batch twin
    assert {(r.event_id, r.rn) for r in got.collect()} == {
        (r.event_id, r.rn) for r in batch_twin.collect()
    }
    # count invariant: per key, accepted == min(quota, seen)
    seen = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    acc = got.groupBy("user_id", "window_start").agg(
        F.count(F.lit(1)).alias("n_acc")
    )
    bad = (
        seen.join(acc, ["user_id", "window_start"], "left")
        .filter(
            F.coalesce(F.col("n_acc"), F.lit(0))
            != F.least(F.lit(3), F.col("n"))
        )
        .count()
    )
    assert bad == 0
    assert cut is not None  # split sanity


def test_semdedup_screen_stream_flags_planted_dups(spark, tmp_path):
    """Streaming SemDeDup screen: exact copies of corpus vectors arriving
    on the stream must be flagged against their originals (a copy shares
    its source's top-1 cluster by construction); negated vectors (cosine
    -1) must never be. Two micro-batches exercise the static-index
    state across triggers."""
    from pyspark.sql import types as T

    from praw_etl_student_dropout_spark.operators.similarity import (
        assign_centroids,
        sample_centroids,
    )
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        semdedup_screen_stream,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sample_centroids(corpus, 8)
    indexed = assign_centroids(corpus, cents)

    copies = corpus.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    negs = corpus.select(
        (F.col("vec_id") + 2000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "label",
    )
    in_dir = str(tmp_path / "vecs_in")
    copies.coalesce(1).write.parquet(in_dir)
    negs.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    flagged_path = str(tmp_path / "flagged")
    semdedup_screen_stream(
        stream,
        indexed,
        cents,
        flagged_path,
        str(tmp_path / "ckpt"),
        threshold=0.99,
        nprobe=2,
    )
    got = spark.read.parquet(flagged_path)
    pairs = {(r.new_id, r.corpus_id) for r in got.collect()}
    n_corpus = corpus.count()
    # every copy flags its own original at cosine 1.0
    expected_self = {(vid + 1000, vid) for (vid,) in corpus.select("vec_id").collect()}
    assert expected_self <= pairs
    # no negated vector is ever flagged
    assert all(new_id < 2000 for new_id, _ in pairs)
    # cosine column is verified exact: all >= threshold
    assert got.agg(F.min("cosine")).first()[0] >= 0.99
    assert n_corpus > 0


def test_kmv_stream_equals_batch_sketch(spark, sf_dir, tmp_path):
    """The streamed KMV sketch must equal the whole-data batch sketch
    BIT-FOR-BIT regardless of micro-batch boundaries (deterministic
    content-hash coin + exact bottom-k mergeability)."""
    from praw_etl_student_dropout_spark.operators.sketches import kmv_sample
    from praw_etl_student_dropout_spark.streaming.stream_jobs import kmv_stream

    events = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "value"
    )
    in_dir = str(tmp_path / "in")
    events.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(in_dir)
    events.filter(F.col("event_id") % 3 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    events.filter(F.col("event_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    sketch_path = str(tmp_path / "sketch")
    kmv_stream(stream, "event_id", sketch_path, str(tmp_path / "ck"), k=64, seed=9)

    import os

    last = sorted(
        int(d[1:]) for d in os.listdir(sketch_path) if d.startswith("v")
    )[-1]
    streamed = spark.read.parquet(f"{sketch_path}/v{last}")
    batch = kmv_sample(events, "event_id", k=64, seed=9)
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_ohlc_stream_matches_batch(spark, events_dir, sf_dir, tmp_path):
    """Streaming OHLC bars == batch twin (complete mode), and append
    mode emits only finalized, batch-identical bars."""
    from praw_etl_student_dropout_spark.streaming.batch_windows import ohlc_agg
    from praw_etl_student_dropout_spark.streaming.stream_jobs import ohlc_stream

    batch = ohlc_agg(load_tables(spark, sf_dir, ["events"])["events"])
    streamed = _drain(
        spark,
        ohlc_stream(read_event_stream(spark, events_dir)),
        tmp_path,
        "ohlc_complete",
        "complete",
    )
    assert _as_set(streamed) == _as_set(batch)

    appended = _drain(
        spark,
        ohlc_stream(read_event_stream(spark, events_dir)),
        tmp_path,
        "ohlc_append",
        "append",
    )
    assert _as_set(appended) <= _as_set(batch)


def test_bloom_stream_equals_batch_filter(spark, events_dir, sf_dir, tmp_path):
    """The streamed bloom filter is BIT-IDENTICAL to the batch-built
    one (OR-fold mergeability), and screening with it never misses a
    seen key (no false negatives by construction)."""
    from praw_etl_student_dropout_spark.operators.joins import (
        bloom_filter_build,
        bloom_might_contain,
    )
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        bloom_stream,
        read_bloom_filter,
    )

    bloom_stream(
        read_event_stream(spark, events_dir),
        "user_id",
        str(tmp_path / "bloom_state"),
        str(tmp_path / "bloom_ckpt"),
    )
    streamed = read_bloom_filter(spark, str(tmp_path / "bloom_state"))
    batch_events = load_tables(spark, sf_dir, ["events"])["events"]
    batch = bloom_filter_build(batch_events.select("user_id"), "user_id")
    assert streamed == batch

    misses = batch_events.filter(
        ~bloom_might_contain(F.col("user_id"), streamed)
    ).count()
    assert misses == 0


def test_rate_limit_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: replaying a micro-batch whose state
    version already committed (crash between state write and checkpoint
    commit) must not duplicate acceptances or double-count state — the
    ADVICE r6 replay flaw. Prior state loads strictly below batch_id;
    acceptances overwrite their own batch_id partition."""
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        _rate_limit_one_batch,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    ordered = events.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    b0 = spark.createDataFrame(ordered[:half], events.schema)
    b1 = spark.createDataFrame(ordered[half:], events.schema)
    acc, st = str(tmp_path / "acc"), str(tmp_path / "st")

    _rate_limit_one_batch(b0, 0, acc, st, 3, "day")
    _rate_limit_one_batch(b1, 1, acc, st, 3, "day")
    once_acc = _as_set(spark.read.parquet(acc))
    once_state = _as_set(spark.read.parquet(f"{st}/v1"))

    # replay batch 1 (v1 exists on disk, checkpoint "lost" the commit)
    _rate_limit_one_batch(b1, 1, acc, st, 3, "day")
    assert _as_set(spark.read.parquet(acc)) == once_acc
    assert _as_set(spark.read.parquet(f"{st}/v1")) == once_state

    # the min(quota, seen) invariant still holds after the replay
    seen = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    got = spark.read.parquet(acc)
    n_bad = (
        seen.join(
            got.groupBy("user_id", "window_start").agg(
                F.count(F.lit(1)).alias("n_acc")
            ),
            ["user_id", "window_start"],
            "left",
        )
        .filter(
            F.coalesce(F.col("n_acc"), F.lit(0)) != F.least(F.lit(3), F.col("n"))
        )
        .count()
    )
    assert n_bad == 0


def test_kmv_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Replaying a KMV micro-batch whose sketch version already committed
    must reproduce the identical sketch — not merge the batch's own ids
    into themselves (a duplicated id could occupy two of the k slots and
    evict a distinct id, diverging from the batch sketch)."""
    from praw_etl_student_dropout_spark.operators.sketches import kmv_sample
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        _kmv_merge_one_batch,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "value"
    )
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "sketch")

    _kmv_merge_one_batch(b0, 0, "event_id", path, 64, 9)
    _kmv_merge_one_batch(b1, 1, "event_id", path, 64, 9)
    once = _as_set(spark.read.parquet(f"{path}/v1"))

    _kmv_merge_one_batch(b1, 1, "event_id", path, 64, 9)  # replay
    assert _as_set(spark.read.parquet(f"{path}/v1")) == once

    # and the replayed sketch still equals the whole-data batch sketch
    batch = kmv_sample(events, "event_id", k=64, seed=9)
    assert _as_set(spark.read.parquet(f"{path}/v1")) == _as_set(batch)


def test_orphan_cleanup_never_touches_other_databases_tables(spark, tmp_path):
    """ADVICE r6: the pre-saveAsTable orphan cleanup must resolve the
    location from the OWNING database's metadata. With a non-default
    current database, a missing sink table must not delete the
    default-database table of the same name."""
    import os

    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        _remove_orphaned_table_location,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS orphan_aux")
    try:
        spark.range(5).write.mode("overwrite").saveAsTable(
            "default.orphan_guard"
        )
        spark.catalog.setCurrentDatabase("orphan_aux")
        # sink 'orphan_guard' doesn't exist in orphan_aux: cleanup must
        # target orphan_aux.db/orphan_guard, NOT default's live table.
        _remove_orphaned_table_location(spark, "orphan_guard")
        spark.catalog.setCurrentDatabase("default")
        assert spark.table("default.orphan_guard").count() == 5

        # and a real orphan in the aux db IS removed
        aux_loc = spark.catalog.getDatabase("orphan_aux").locationUri
        for prefix in ("file://", "file:"):
            if aux_loc.startswith(prefix):
                aux_loc = aux_loc[len(prefix):]
        orphan_dir = os.path.join(aux_loc, "dead_table")
        os.makedirs(orphan_dir, exist_ok=True)
        spark.catalog.setCurrentDatabase("orphan_aux")
        _remove_orphaned_table_location(spark, "dead_table")
        assert not os.path.isdir(orphan_dir)
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS default.orphan_guard")
        spark.sql("DROP DATABASE IF EXISTS orphan_aux CASCADE")


def test_minhash_screen_stream_matches_batch_and_resumes(spark, sf_dir, tmp_path):
    """Streaming MinHash screen == the batch incremental operator on the
    same split (round-7: the near-dup sibling of the span screen), and a
    checkpointed re-run with no new files appends nothing. Jaccard-1
    self-partners exist by construction: every streamed doc is screened
    against a corpus that contains near-identical fixture duplicates or
    itself via the 0.5 threshold only where true Jaccard clears it."""
    from praw_etl_student_dropout_spark.operators.dedup import (
        minhash_index,
        minhash_pairs_incremental,
    )
    from praw_etl_student_dropout_spark.schemas import DOCUMENTS
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        minhash_screen_stream,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # stream side carries exact copies of corpus docs (shifted ids), so
    # every streamed doc has a guaranteed jaccard-1.0 partner
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    new_docs = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    ).unionByName(
        corpus.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    banded, shingles = minhash_index(corpus, "text", "doc_id", 32, 8, 3)
    index_dir = str(tmp_path / "idx")
    banded.write.parquet(f"{index_dir}/banded")
    shingles.write.parquet(f"{index_dir}/shingles")

    batch_expect = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in minhash_pairs_incremental(
            new_docs,
            spark.read.parquet(f"{index_dir}/banded"),
            spark.read.parquet(f"{index_dir}/shingles"),
            "text", "doc_id", threshold=0.5,
        ).collect()
    }
    # every streamed exact copy of a corpus doc must be flagged at 1.0
    copies = {r.doc_id for r in new_docs.filter(F.col("doc_id") >= 2_000_000).collect()}
    flagged_copies = {
        new_id for (new_id, cid, j) in batch_expect
        if new_id >= 2_000_000 and j == 1.0 and cid == new_id - 2_000_000
    }
    assert flagged_copies == copies and copies

    arriving = str(tmp_path / "arriving")
    new_docs.filter(F.col("doc_id") < 2_000_000).write.parquet(arriving)
    new_docs.filter(F.col("doc_id") >= 2_000_000).write.mode("append").parquet(
        arriving
    )
    target = str(tmp_path / "flagged")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(DOCUMENTS).parquet(arriving)
    minhash_screen_stream(stream, index_dir, target, ckpt, threshold=0.5)
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in spark.read.parquet(target).collect()
    }
    assert got == batch_expect and got
    # resume with the same checkpoint: nothing new → nothing appended
    stream2 = spark.readStream.schema(DOCUMENTS).parquet(arriving)
    minhash_screen_stream(stream2, index_dir, target, ckpt, threshold=0.5)
    assert spark.read.parquet(target).count() == len(got)


def test_incremental_reference_stream_equals_batch(spark, tmp_path):
    """CAPSTONE — the reference's actual operating mode (re-run the
    script on a cadence, INSERT IGNORE keeping the warehouse stable) as
    a checkpointed stream: drain the same raw posts in two micro-batch
    files and the final star read-back must VALUE-equal the one-shot
    batch pipeline (surrogate ids may differ; the read-back resolves
    them to natural values, which is what the reference consumed)."""
    from praw_etl_student_dropout_spark.plans.reference_pipeline import (
        extract,
        run_pipeline,
    )
    from praw_etl_student_dropout_spark.streaming.incremental_reference import (
        _reference_merge_one_batch,
        incremental_reference_stream,
        query_star_incremental,
    )

    from praw_etl_student_dropout_spark.plans.reference_pipeline import (
        query_star,
    )

    keys, terms = ["college", "gradschool"], ["dropout", "quit school"]
    fetcher = "praw_etl_student_dropout_spark.sources.fake_api:fetch_page"

    # one-shot batch reference over ALL posts
    batch_wh = str(tmp_path / "wh_batch")
    res = run_pipeline(spark, keys, terms, batch_wh, fetcher=fetcher)
    batch_star = _as_set(res.heatmap)
    batch_rows = _as_set(query_star(spark, batch_wh))
    raw_count = res.raw_count

    # the same raw posts, split into two arrival files (glob path: each
    # write lands as its own subdirectory the file source then lists)
    raw = extract(spark, keys, terms, fetcher).cache()
    posts_dir = tmp_path / "posts"
    posts_dir.mkdir()
    half = F.abs(F.xxhash64("id")) % 2
    raw.filter(half == 0).coalesce(1).write.parquet(str(posts_dir / "f0"))
    inc_wh = str(tmp_path / "wh_inc")
    ckpt = str(tmp_path / "ckpt")
    incremental_reference_stream(spark, str(posts_dir) + "/*", inc_wh, ckpt)
    raw.filter(half == 1).coalesce(1).write.parquet(str(posts_dir / "f1"))
    incremental_reference_stream(spark, str(posts_dir) + "/*", inc_wh, ckpt)

    star = query_star_incremental(spark, inc_wh)
    assert star.count() == raw_count
    # full value equality of the analytics surface
    from praw_etl_student_dropout_spark.operators.aggregations import (
        pivot_count,
    )

    inc_heat = _as_set(
        pivot_count(
            star.select("subreddit", "sentiment_label"),
            row_key="subreddit",
            pivot_key="sentiment_label",
            pivot_values=["positive", "negative", "neutral"],
        )
    )
    assert inc_heat == batch_star
    # row-level parity too (id-resolved natural values)
    assert _as_set(star) == batch_rows

    # replay idempotence: re-running the LAST batch changes nothing
    last = spark.read.parquet(str(posts_dir / "f1"))
    before = _as_set(query_star_incremental(spark, inc_wh))
    _reference_merge_one_batch(last, 1, inc_wh)
    assert _as_set(query_star_incremental(spark, inc_wh)) == before
    raw.unpersist()


def test_decayed_counts_stream_matches_batch(spark, events_dir, sf_dir, tmp_path):
    """The streaming decayed-trending table equals the a52 batch entry
    bit-for-bit: daily-count state + event-time-anchored decay fold."""
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        decayed_counts_stream,
    )

    batch = catalog_all()["a52_decayed_counts"].builder(spark, sf_dir)
    decayed_counts_stream(
        read_event_stream(spark, events_dir),
        "decayed_sink",
        str(tmp_path / "ckpt_decayed"),
    )
    streamed = spark.table("decayed_sink")
    assert _as_set(streamed.select(*batch.columns)) == _as_set(batch)


def test_decayed_counts_stream_replay_is_idempotent(spark, events_dir, sf_dir, tmp_path):
    """Re-running the availableNow stream over the same checkpoint (no new
    data) leaves the sink table exactly as it was — the overwrite emission
    converges instead of double-counting."""
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        decayed_counts_stream,
    )

    ckpt = str(tmp_path / "ckpt_decayed_replay")
    decayed_counts_stream(
        read_event_stream(spark, events_dir), "decayed_sink_replay", ckpt
    )
    first = _as_set(spark.table("decayed_sink_replay"))
    decayed_counts_stream(
        read_event_stream(spark, events_dir), "decayed_sink_replay", ckpt
    )
    assert _as_set(spark.table("decayed_sink_replay")) == first


def test_cusum_stream_matches_batch_twin(spark, events_dir, sf_dir, tmp_path):
    """The streaming CUSUM drift table equals the st11_cusum_batch entry
    bit-for-bit: integer daily-cents state, fold recomputed per emission
    via the SAME batch_windows.cusum_fold the graded entry calls."""
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.streaming.stream_jobs import cusum_stream

    batch = catalog_all()["st11_cusum_batch"].builder(spark, sf_dir)
    cusum_stream(
        read_event_stream(spark, events_dir),
        "cusum_sink",
        str(tmp_path / "ckpt_cusum"),
    )
    streamed = spark.table("cusum_sink")
    assert _as_set(streamed.select(*batch.columns)) == _as_set(batch)
