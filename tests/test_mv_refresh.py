"""q21 incremental-MV maintenance (round-13, VERDICT r12 #4): the
base/live layout pair, the delta refresh's idempotency, partition
locality (unaffected year directories are never rewritten), and gc
compatibility of the partitioned bucketed layout."""

from __future__ import annotations

import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scratch_gc import gc_scratch  # noqa: E402


def _drop_tables(spark, *names):
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def _mv_tables(sf_dir):
    from praw_etl_student_dropout_spark.operators.bucketing import (
        _Q21_DELTA_TAG,
    )

    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    return (
        f"bkt_q21base_{_Q21_DELTA_TAG}_{tag}_b8",
        f"bkt_q21live_{_Q21_DELTA_TAG}_{tag}_b8",
        f"bkt_lineitem_{tag}_b8",
        f"bkt_orders_{tag}_b8",
    )


def test_refresh_idempotent_and_partition_local(spark, sf_dir, tmp_path, monkeypatch):
    from praw_etl_student_dropout_spark.operators.bucketing import (
        Q21_DELTA_ORDER_CUT,
        ensure_q21_mv_pair,
        refresh_q21_preagg,
    )

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    base_n, live_n, li_n, ord_n = _mv_tables(sf_dir)
    _drop_tables(spark, base_n, live_n, li_n, ord_n)

    base_t, live_t, delta_path = ensure_q21_mv_pair(spark, sf_dir)
    assert (base_t, live_t) == (base_n, live_n)
    assert (Path(delta_path) / "_SUCCESS").exists()
    # live starts as a copy of the pre-delta base
    cut_year = int(Q21_DELTA_ORDER_CUT[:4])
    base_rows = sorted(map(tuple, spark.table(base_t).collect()))
    assert base_rows == sorted(map(tuple, spark.table(live_t).collect()))

    from praw_etl_student_dropout_spark.operators.bucketing import (
        _Q21_DELTA_TAG,
    )

    live_root = (
        tmp_path
        / "bucketed"
        / f"{Path(sf_dir).name}_b8"
        / f"q21_preagg_live_{_Q21_DELTA_TAG}"
    )
    pre_dirs = {d.name for d in live_root.iterdir() if d.name.startswith("o_year=")}
    # capture pre-refresh file states per partition dir
    states = {
        d: sorted(
            (f.name, f.stat().st_mtime_ns) for f in (live_root / d).iterdir()
        )
        for d in pre_dirs
    }

    refresh_q21_preagg(spark, sf_dir)
    once = sorted(map(tuple, spark.table(live_t).collect()))
    # idempotent: second refresh converges (sum would double-count if the
    # merge read the live table instead of the immutable base)
    refresh_q21_preagg(spark, sf_dir)
    assert sorted(map(tuple, spark.table(live_t).collect())) == once

    # the refreshed live MV equals the full-history pre-agg
    from praw_etl_student_dropout_spark.operators.bucketing import (
        ensure_q21_preagg,
    )

    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    _drop_tables(spark, f"bkt_q21preagg_{tag}_b8")
    full_t = ensure_q21_preagg(spark, sf_dir)
    full = sorted(
        map(
            tuple,
            spark.table(full_t).select(
                "l_orderkey", "l_suppkey", "supp_late", "late_rows"
            ).collect(),
        )
    )
    live_vals = sorted(
        map(
            tuple,
            spark.table(live_t).select(
                "l_orderkey", "l_suppkey", "supp_late", "late_rows"
            ).collect(),
        )
    )
    assert live_vals == full

    # partition locality: affected years gained/changed files, but at
    # least one pre-cut year partition is byte-identical (mtime + names)
    post_dirs = {d.name for d in live_root.iterdir() if d.name.startswith("o_year=")}
    changed = {
        d
        for d in pre_dirs
        if sorted(
            (f.name, f.stat().st_mtime_ns) for f in (live_root / d).iterdir()
        )
        != states[d]
    }
    early = {d for d in pre_dirs if int(d.split("=")[1]) < cut_year}
    assert early, "fixture must span years before the cut"
    assert not (changed & early), (
        f"refresh rewrote unaffected partitions: {changed & early}"
    )
    # the affected years WERE rewritten (the delta really landed)
    assert changed and all(int(d.split("=")[1]) >= cut_year for d in changed)
    assert post_dirs >= pre_dirs

    # gc recognizes the partitioned bucketed layouts as valid
    report = gc_scratch(root=tmp_path)
    rel = f"bucketed/{Path(sf_dir).name}_b8"
    assert f"{rel}/q21_preagg_base_{_Q21_DELTA_TAG}" in report["valid"]
    assert f"{rel}/q21_preagg_live_{_Q21_DELTA_TAG}" in report["valid"]
    assert not report["removed"]

    # fresh-session re-registration path: drop catalog entries, ensure
    # re-registers from disk (MSCK partition discovery) with values intact
    _drop_tables(spark, base_n, live_n)
    ensure_q21_mv_pair(spark, sf_dir)
    assert sorted(map(tuple, spark.table(live_t).collect())) == once
    assert sorted(map(tuple, spark.table(base_t).collect())) == base_rows
    _drop_tables(spark, base_n, live_n, li_n, ord_n, f"bkt_q21preagg_{tag}_b8")
