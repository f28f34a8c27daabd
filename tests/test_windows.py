"""Distributed global-rank/ntile operators (operators/windows.py).

A plain ``ntile().over(Window.orderBy(...))`` moves the whole frame to
one task (single-partition WindowExec). These tests pin the distributed
replacements to the exact single-partition semantics — same ranks, same
tiles — and assert the plan never materializes a data-scale global
window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators.windows import (
    distributed_ntile,
    distributed_ntile_multi,
    distributed_row_number,
)
from praw_etl_student_dropout_spark.plans import catalog_all


@pytest.fixture(scope="module")
def registry():
    return catalog_all()


def _frame(spark, n: int, partitions: int = 8):
    """n rows with a non-unique value column (ties exercise the tiebreak)
    spread over several input partitions."""
    return (
        spark.range(n, numPartitions=partitions)
        .select(
            F.col("id"),
            (F.col("id") * 37 % 11).alias("v"),
        )
    )


def test_distributed_row_number_matches_global_window(spark):
    df = _frame(spark, 523)
    got = {
        r["id"]: r["rank"]
        for r in distributed_row_number(
            df, [F.asc("v"), F.asc("id")], "rank", num_partitions=7
        ).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id")))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,tiles", [(523, 4), (7, 4), (3, 4), (100, 7), (1, 4)])
def test_distributed_ntile_matches_window_ntile(spark, n, tiles):
    df = _frame(spark, n)
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(
            df, tiles, [F.desc("v"), F.asc("id")], "tile", num_partitions=5
        ).collect()
    }
    want = {
        r["id"]: r["tile"]
        for r in df.withColumn(
            "tile", F.ntile(tiles).over(Window.orderBy(F.desc("v"), F.asc("id")))
        ).collect()
    }
    assert got == want


def test_distributed_ntile_multi_matches_per_metric_ntile(spark):
    df = spark.range(301, numPartitions=8).select(
        F.col("id"),
        (F.col("id") * 37 % 11).alias("a"),
        (F.col("id") * 13 % 5).alias("b"),
    )
    got = {
        r["id"]: (r["ta"], r["tb"])
        for r in distributed_ntile_multi(
            df,
            4,
            [("ta", -F.col("a")), ("tb", -F.col("b"))],
            "id",
            num_partitions=5,
        ).collect()
    }
    want = {
        r["id"]: (r["ta"], r["tb"])
        for r in df.select(
            "id",
            F.ntile(4).over(Window.orderBy(F.desc("a"), F.asc("id"))).alias("ta"),
            F.ntile(4).over(Window.orderBy(F.desc("b"), F.asc("id"))).alias("tb"),
        ).collect()
    }
    assert got == want


def test_rfm_plan_has_no_data_scale_global_window(spark, sf_dir, registry):
    """a30_rfm_segments regression: no unpartitioned windowspec anywhere
    in its physical plan (the offsets prefix-sum is partitioned by
    metric, so even the tiny-frame window is partitioned)."""
    from tools.plan_audit import global_windows

    plan = (
        registry["a30_rfm_segments"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert global_windows(plan) == 0
    assert "Exchange SinglePartition" not in plan.split("AdaptiveSparkPlan")[0]
