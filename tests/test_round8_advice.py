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


def test_gini_matches_mean_absolute_difference_form(spark):
    """a44's rank-form Gini equals the definitional form
    G = sum_ij |x_i - x_j| / (2 n^2 mean) on a hand series."""
    import datetime
    import itertools

    xs = [100, 200, 200, 500, 1000, 0, 300]
    n = len(xs)
    mean = sum(xs) / n
    g_def = sum(abs(a - b) for a, b in itertools.product(xs, xs)) / (
        2 * n * n * mean
    )
    # rank form over ascending order (ties broken arbitrarily — the
    # formula is tie-stable because equal x contribute symmetric terms)
    s = sorted(xs)
    g_rank = 2 * sum((i + 1) * x for i, x in enumerate(s)) / (
        n * sum(s)
    ) - (n + 1) / n
    assert abs(g_def - g_rank) < 1e-12

    # and the catalog entry's Spark expression reproduces it: build a
    # one-nation orders/customer pair carrying exactly these totals.
    d0 = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, i, "O", float(x), d0, "1-URGENT") for i, x in enumerate(xs)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(i, f"c{i}", 7, 0.0, "BUILDING") for i in range(n)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    orders.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    cust.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    from praw_etl_student_dropout_spark.plans.catalog import REGISTRY

    got = REGISTRY["a44_gini_customer_value"].builder(spark, d).collect()
    assert len(got) == 1
    assert abs(got[0]["gini"] - g_rank) < 1e-6


def test_ewma_matches_python_reference(spark):
    """w15's 8-tap renormalized EWMA equals a pure-Python fold over a
    hand-built daily series (one event per day, integer cents)."""
    import datetime

    vals = [10.0, 12.0, 9.5, 20.0, 0.25, 7.75, 14.0, 3.0, 8.5, 11.25]
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i, 5, 0, 0), 1, "tick", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from praw_etl_student_dropout_spark.plans.catalog import REGISTRY

    got = {
        r["day"].day: r["ewma_value"]
        for r in REGISTRY["w15_ewma_smooth"].builder(spark, d).collect()
    }
    alpha, cents = 0.3, [round(v * 100) for v in vals]
    for t in range(len(vals)):
        taps = [(alpha * (1 - alpha) ** j, cents[t - j]) for j in range(8) if t - j >= 0]
        expect = round(sum(w * c for w, c in taps) / sum(w for w, _ in taps) / 100, 4)
        assert abs(got[1 + t] - expect) < 1e-9, (t, got[1 + t], expect)


def test_ks_matches_python_reference(spark, tmp_path):
    """a46's integer-CDF KS equals a pure-Python two-sample KS on a
    hand-built events table with deliberate cross-group ties."""
    import bisect
    import datetime

    a = [1.00, 2.50, 2.50, 3.75, 9.99, 2.50]   # click
    b = [0.50, 2.50, 4.00, 4.00, 7.25]          # purchase
    d0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, d0, i, "click", v, "{}") for i, v in enumerate(a)
    ] + [
        (100 + i, d0, i, "purchase", v, "{}") for i, v in enumerate(b)
    ] + [(999, d0, 1, "view", 5.0, "{}")]  # excluded type
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "ks")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    from praw_etl_student_dropout_spark.plans.catalog import REGISTRY

    got = REGISTRY["a46_ks_two_sample"].builder(spark, d).collect()[0]

    sa, sb = sorted(a), sorted(b)
    pts = sorted(set(sa) | set(sb))
    ks = max(
        abs(
            bisect.bisect_right(sa, x) / len(sa)
            - bisect.bisect_right(sb, x) / len(sb)
        )
        for x in pts
    )
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert abs(got["ks_stat"] - round(ks, 6)) < 1e-9


def test_hhi_matches_python_reference(spark, tmp_path):
    """a45's HHI equals the definitional sum of squared shares, and a
    single-supplier nation scores the 10000 monopoly maximum."""
    li = spark.createDataFrame(
        # (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax, rf, ls, shipdate)
        [
            (1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", None),
            (2, 1, 10, 1, 1.0, 300.0, 0.5, 0.0, "N", "O", None),
            (3, 1, 11, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", None),
            (4, 1, 20, 1, 1.0, 777.0, 0.0, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sup = spark.createDataFrame(
        [(10, "s10", 1, 0.0), (11, "s11", 1, 0.0), (20, "s20", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    d = str(tmp_path / "hhi")
    li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    sup.write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    from praw_etl_student_dropout_spark.plans.catalog import REGISTRY

    got = {
        r["nationkey"]: (r["n_suppliers"], r["hhi"])
        for r in REGISTRY["a45_hhi_concentration"].builder(spark, d).collect()
    }
    # nation 1: supplier 10 revenue 100+150=250 cents=25000; supplier 11 = 50 (5000)
    s1, s2 = 25000, 5000
    tot = s1 + s2
    hhi1 = round(10000 * ((s1 / tot) ** 2 + (s2 / tot) ** 2), 4)
    assert got[1] == (2, hhi1)
    assert got[2] == (1, 10000.0)
