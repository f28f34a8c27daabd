"""tools/scratch_gc.py — the validate-or-rebuild contract for load-time
layouts (round-12, VERDICT r11 #8): a corrupted or legacy scratch layout
must be REMOVED by gc, and the owning ensure_* function must then rebuild
a valid layout that produces the same values as plain tables."""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scratch_gc import gc_scratch  # noqa: E402


def _drop_tables(spark, *names):
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_gc_validates_removes_and_rebuild_path(spark, sf_dir, tmp_path, monkeypatch):
    from praw_etl_student_dropout_spark.operators.bucketing import (
        ensure_bucketed_pair,
    )

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    li_name, ord_name = f"bkt_lineitem_{tag}_b4", f"bkt_orders_{tag}_b4"
    _drop_tables(spark, li_name, ord_name)

    # 1. build a valid layout and take a reference result off it
    li_t, ord_t = ensure_bucketed_pair(spark, sf_dir, num_buckets=4)
    assert (li_t, ord_t) == (li_name, ord_name)
    ref = sorted(
        map(
            tuple,
            spark.table(li_t)
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(spark.table(ord_t), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("n").cast("long").alias("n"))
            .collect(),
        )
    )
    layout_root = tmp_path / "bucketed" / f"{Path(sf_dir).name}_b4"
    report = gc_scratch(root=tmp_path)
    assert f"bucketed/{Path(sf_dir).name}_b4/lineitem" in report["valid"]
    assert not report["removed"]

    # 2. corrupt one layout (kill the _SUCCESS marker: partial write)
    (layout_root / "lineitem" / "_SUCCESS").unlink()
    report = gc_scratch(root=tmp_path)
    assert any("lineitem" in k for k in report["removed"])
    assert not (layout_root / "lineitem").exists(), "gc must remove, not keep"
    # orders was untouched and must survive
    assert (layout_root / "orders" / "_SUCCESS").exists()

    # 3. legacy dir without the _b<N> spec is swept
    legacy = tmp_path / "bucketed" / "old_layout"
    (legacy / "lineitem").mkdir(parents=True)
    report = gc_scratch(root=tmp_path)
    assert report["removed"] == {
        "bucketed/old_layout": "legacy path without _b<N> bucket spec"
    }
    assert not legacy.exists()

    # 4. dry-run only reports
    (layout_root / "orders" / "_SUCCESS").unlink()
    report = gc_scratch(root=tmp_path, dry_run=True)
    assert any("orders" in k for k in report["removed"])
    assert (layout_root / "orders").exists()
    shutil.rmtree(layout_root / "orders")

    # 5. REBUILD path: a fresh session (simulated by dropping the catalog
    # entries) re-materializes the swept layouts and values match
    _drop_tables(spark, li_name, ord_name)
    li_t, ord_t = ensure_bucketed_pair(spark, sf_dir, num_buckets=4)
    assert (layout_root / "lineitem" / "_SUCCESS").exists()
    got = sorted(
        map(
            tuple,
            spark.table(li_t)
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(spark.table(ord_t), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("n").cast("long").alias("n"))
            .collect(),
        )
    )
    assert got == ref
    _drop_tables(spark, li_name, ord_name)


def test_gc_refuses_nothing_on_missing_root(tmp_path):
    report = gc_scratch(root=tmp_path / "nope")
    assert report == {"valid": [], "removed": {}, "unknown": [], "dry_run": False}


def test_gc_reports_unknown_family_without_removing(tmp_path):
    """An unrecognized top-level directory (a future layout family, or a
    user-parked dir) is reported, never removed, unless --purge-unknown
    (ADVICE r12)."""
    stray = tmp_path / "future_family" / "something"
    stray.mkdir(parents=True)
    report = gc_scratch(root=tmp_path)
    assert report["unknown"] == ["future_family"]
    assert not report["removed"]
    assert stray.exists()
    # explicit purge removes it
    report = gc_scratch(root=tmp_path, purge_unknown=True)
    assert "future_family" in report["removed"]
    assert not stray.parent.exists()


def test_ensure_rebuilds_when_registered_location_swept(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A warm session whose catalog still registers a layout table must
    NOT trust the registration after the files are swept (ADVICE r12):
    ensure_* re-verifies the on-disk _SUCCESS marker and rebuilds."""
    import shutil as _shutil
    from pathlib import Path

    from praw_etl_student_dropout_spark.operators.bucketing import (
        ensure_q21_preagg,
    )

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    table = f"bkt_q21preagg_{tag}_b8"
    _drop_tables(spark, table)

    assert ensure_q21_preagg(spark, sf_dir) == table
    ref = sorted(map(tuple, spark.table(table).collect()))
    layout = tmp_path / "bucketed" / f"{Path(sf_dir).name}_b8" / "q21_preagg"

    # sweep the files but keep the catalog registration (the gc-while-
    # warm-session hazard): ensure must rebuild, not short-circuit
    _shutil.rmtree(layout)
    assert spark.catalog.tableExists(table)
    assert ensure_q21_preagg(spark, sf_dir) == table
    assert (layout / "_SUCCESS").exists()
    assert sorted(map(tuple, spark.table(table).collect())) == ref
    _drop_tables(spark, table)


def test_q21_preagg_survives_gc_cycle(spark, sf_dir, tmp_path, monkeypatch):
    """The graded q21_preagg_colocation layout obeys the same contract:
    a partial write is swept by gc and ensure_q21_preagg rebuilds a
    value-identical pre-agg in a fresh-catalog session."""
    from pathlib import Path

    from praw_etl_student_dropout_spark.operators.bucketing import (
        ensure_q21_preagg,
    )

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    table = f"bkt_q21preagg_{tag}_b8"
    _drop_tables(spark, table)

    assert ensure_q21_preagg(spark, sf_dir) == table
    ref = sorted(map(tuple, spark.table(table).collect()))
    layout = tmp_path / "bucketed" / f"{Path(sf_dir).name}_b8" / "q21_preagg"
    assert (layout / "_SUCCESS").exists()

    # partial write → swept
    (layout / "_SUCCESS").unlink()
    report = gc_scratch(root=tmp_path)
    assert any("q21_preagg" in k for k in report["removed"])
    assert not layout.exists()

    # fresh catalog → rebuild → same values
    _drop_tables(spark, table)
    ensure_q21_preagg(spark, sf_dir)
    assert sorted(map(tuple, spark.table(table).collect())) == ref
    _drop_tables(spark, table)
