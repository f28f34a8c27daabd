"""Round-8 regression tests for the four ADVICE r7 items.

1. stream_jobs._state_version_below fails loudly when the state path
   predates the checkpoint (fresh checkpoint over old state).
2. stream_jobs._kmv_merge_one_batch resolves cross-version id
   collisions prior-wins (deterministic, not an arbitrary
   dropDuplicates pick).
3. operators.joins.interval_overlap_join pre-filters malformed
   intervals (null / inverted endpoints) instead of throwing inside
   the bin explode.
4. (dedup.minhash_pairs_incremental id-space contract is a documented
   docstring contract — behavior covered by the existing shifted-id
   incremental test in test_streaming.py.)
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_state_version_above_batch_fails_loudly(spark, tmp_path):
    """A state dir holding v3 while the checkpoint says batch 0 means
    the state predates this checkpoint — must raise, not silently
    restart state from scratch over stale partitions (ADVICE r7)."""
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        _state_version_below,
    )

    path = tmp_path / "state"
    (path / "v3").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="predates this checkpoint"):
        _state_version_below(str(path), 0)

    # legitimate shapes still resolve:
    assert _state_version_below(str(path), 5) == 3  # normal progress
    assert _state_version_below(str(path), 3) is None  # replay of v3
    assert _state_version_below(str(tmp_path / "absent"), 0) is None


def test_kmv_updated_payload_prior_wins(spark, tmp_path):
    """When an id arrives again with a DIFFERENT payload, the merged
    sketch must keep the first-seen row deterministically (ADVICE r7:
    bare dropDuplicates([id]) made the survivor an arbitrary pick)."""
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        _kmv_merge_one_batch,
    )

    b0 = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "event_id long, value double"
    )
    # same ids, mutated payloads
    b1 = spark.createDataFrame(
        [(i, float(i) + 1000.0) for i in range(20)],
        "event_id long, value double",
    )
    path = str(tmp_path / "sketch")
    _kmv_merge_one_batch(b0, 0, "event_id", path, 16, 9)
    _kmv_merge_one_batch(b1, 1, "event_id", path, 16, 9)

    merged = spark.read.parquet(f"{path}/v1")
    assert merged.count() == 16
    # every surviving row carries the batch-0 payload (value < 1000)
    assert merged.filter(F.col("value") >= 1000.0).count() == 0


def test_interval_overlap_malformed_rows_drop(spark):
    """Inverted and null-endpoint intervals drop deliberately instead of
    exploding inside F.sequence (ADVICE r7)."""
    from praw_etl_student_dropout_spark.operators.joins import (
        interval_overlap_join,
    )

    d = datetime.datetime
    left = spark.createDataFrame(
        [
            (1, "ok", d(2024, 1, 1), d(2024, 1, 5)),
            (1, "inverted", d(2024, 1, 9), d(2024, 1, 2)),
            (1, "null_end", d(2024, 1, 1), None),
        ],
        "k int, tag string, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [(1, "r1", d(2024, 1, 3), d(2024, 1, 10))],
        "k int, rtag string, rs timestamp, re timestamp",
    )
    got = interval_overlap_join(
        left, right, ["k"], "s", "e", "rs", "re", bin_unit="day"
    )
    rows = [(r.tag, r.rtag) for r in got.collect()]
    assert rows == [("ok", "r1")]


def test_plan_audit_flags_forward_unbounded_rescan(spark):
    """The audit rule must flag [currentRow, unboundedFollowing]-shaped
    frames (the t8 O(n^2)-per-partition trap, SURVEY §9a) and stay quiet
    on full-partition and running frames."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from plan_audit import forward_rescan_frames
    from pyspark.sql.window import Window

    def plan_of(w):
        df = spark.range(10).withColumn("k", F.col("id") % 2)
        return (
            df.select(F.sum("id").over(w).alias("s"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    base = Window.partitionBy("k").orderBy("id")
    bad_rows = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    bad_range = base.rangeBetween(Window.currentRow, Window.unboundedFollowing)
    bad_offset = base.rowsBetween(2, Window.unboundedFollowing)
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    assert forward_rescan_frames(plan_of(bad_rows)) == 1
    assert forward_rescan_frames(plan_of(bad_range)) == 1
    assert forward_rescan_frames(plan_of(bad_offset)) == 1
    assert forward_rescan_frames(plan_of(full)) == 0
    assert forward_rescan_frames(plan_of(running)) == 0
