"""Table-maintenance operators: clustered write, compaction, z-order.

The maintenance loop a parquet warehouse runs continuously — verified on
fixture-scale data with the same assertions that matter at 100 TB:
layout shape, atomic-swap safety, data equality, and per-file locality.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators.maintenance import (
    compact_parquet,
    data_file_sizes,
    write_clustered,
    zorder_by,
)
from praw_etl_student_dropout_spark.sources.readers import load_tables


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_write_clustered_layout_and_roundtrip(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    dest = str(tmp_path / "orders_clustered")
    write_clustered(
        orders,
        dest,
        partition_cols=["o_orderstatus"],
        sort_cols=["o_totalprice"],
        max_records_per_file=200,
    )
    # Hive layout: one directory per status value
    dirs = {d for d in os.listdir(dest) if d.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
    # maxRecordsPerFile splits each partition into multiple capped files
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(dest, d)) if f.endswith(".parquet")]
        assert len(files) >= 2
    back = spark.read.parquet(dest)
    cols = orders.columns
    assert _sorted_rows(back, cols) == _sorted_rows(orders, cols)


def test_compact_parquet_binpacks_and_preserves_data(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    dest = str(tmp_path / "orders_small_files")
    orders.repartition(32).write.parquet(dest)
    before = data_file_sizes(spark, dest)
    assert len(before) == 32
    target = max(1, sum(before) // 4)
    stats = compact_parquet(spark, dest, target_file_bytes=target)
    assert stats["files_before"] == 32
    # ceil(total/target) ≈ 4-5 output files, plus per-file overhead slack
    assert stats["files_after"] <= 8
    back = spark.read.parquet(dest)
    cols = orders.columns
    assert _sorted_rows(back, cols) == _sorted_rows(orders, cols)
    # no half-written leftovers from the swap
    assert not any(p.endswith(("_compact_tmp", "_compact_old")) for p in os.listdir(tmp_path))


def test_zorder_tightens_every_dimension(spark):
    # 64x64 grid; z-order into 16 partitions must shrink BOTH x and y
    # per-partition ranges (a plain sort on x leaves y at full range)
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    z = zorder_by(grid, ["x", "y"], num_partitions=16, bits=6)
    ranges = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("rx"),
            (F.max("y") - F.min("y")).alias("ry"),
        )
        .agg(F.avg("rx").alias("ax"), F.avg("ry").alias("ay"))
        .first()
    )
    # ideal 4x4 tiling of a 64-grid gives range 15; allow slack for
    # range-partition boundaries straddling tiles
    assert ranges["ax"] < n / 2, ranges
    assert ranges["ay"] < n / 2, ranges
    # clustering is a reordering, never a rewrite of values
    assert z.count() == n * n
    assert _sorted_rows(z, ["x", "y"]) == _sorted_rows(grid, ["x", "y"])


def test_zorder_single_column_and_constant_column(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(7).alias("const")
    )
    z = zorder_by(df, ["k", "const"], num_partitions=4, bits=8)
    assert z.count() == 100
    assert sorted(r["k"] for r in z.collect()) == list(range(100))


def test_file_skipping_index_prunes_and_preserves_results(spark, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.operators.maintenance import (
        file_stats_index,
        pruned_read,
        write_clustered,
    )
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_clustered")
    # Cluster by order date so per-file envelopes are tight on it
    write_clustered(
        orders.withColumn("od", F.col("o_orderdate")),
        path,
        sort_cols=["od"],
        max_records_per_file=200,
    )
    stats = file_stats_index(spark, path, ["od"]).cache()
    n_files = stats.count()
    assert n_files > 3, "need a multi-file layout to demonstrate pruning"
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-06-30").cast("timestamp")
    lo_v, hi_v = (
        spark.range(1).select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    )
    pruned = pruned_read(spark, stats, "od", lo=lo_v, hi=hi_v)
    import re

    n_pruned_files = len(pruned.inputFiles())
    assert n_pruned_files < n_files, "index must skip non-overlapping files"
    got = (
        pruned.filter((F.col("od") >= lo) & (F.col("od") <= hi))
        .select("o_orderkey")
        .collect()
    )
    want = (
        spark.read.parquet(path)
        .filter((F.col("od") >= lo) & (F.col("od") <= hi))
        .select("o_orderkey")
        .collect()
    )
    assert sorted(r.o_orderkey for r in got) == sorted(r.o_orderkey for r in want)
    stats.unpersist()


def test_cdc_diff_feeds_merge_to_convergence(spark, sf_dir, tmp_path):
    """etl_snapshot_diff x merge_upsert integration: applying the CDC
    delta (inserts + updates) to the old snapshot via merge, then
    anti-joining the deletes, reproduces the new snapshot exactly —
    the incremental load path agrees with a full reload."""
    from praw_etl_student_dropout_spark.operators.merge import (
        merge_upsert,
        read_merged,
    )

    o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    old = o.filter(k % 10 < 9)
    new = o.filter(k % 10 > 0).withColumn(
        "o_totalprice",
        F.when((k % 10).isin(5, 6), F.round(F.col("o_totalprice") + 1.0, 2)).otherwise(
            F.col("o_totalprice")
        ),
    )

    base = str(tmp_path / "warehouse")
    merge_upsert(spark, base, old, ["o_orderkey"])
    # upserts = rows present in new that differ from or are absent in old
    upserts = new.join(old, ["o_orderkey", "o_orderstatus", "o_totalprice"], "left_anti")
    merge_upsert(spark, base, upserts, ["o_orderkey"])
    deletes = old.select("o_orderkey").join(
        new.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    converged = read_merged(spark, base).join(deletes, "o_orderkey", "left_anti")

    assert converged.count() == new.count()
    assert converged.exceptAll(new).isEmpty()
    assert new.exceptAll(converged).isEmpty()


def test_refresh_file_stats_incremental_after_append_and_compact(spark, sf_dir, tmp_path):
    """Manifest refresh cost must track the delta: after an append only
    the new files are scanned; after compaction (all files replaced) the
    refreshed index equals a from-scratch rebuild."""
    from praw_etl_student_dropout_spark.operators.maintenance import (
        file_stats_index,
        refresh_file_stats,
    )

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_idx")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    first.repartition(4).write.parquet(path)
    idx0 = file_stats_index(spark, path, ["o_totalprice"]).cache()
    n0 = idx0.count()

    second.repartition(3).write.mode("append").parquet(path)
    idx1 = refresh_file_stats(spark, path, ["o_totalprice"], idx0).cache()
    rebuilt1 = file_stats_index(spark, path, ["o_totalprice"])

    def canon(df):
        import os as _os

        return sorted(
            (_os.path.basename(r.file),) + tuple(r)[1:] for r in df.collect()
        )

    assert idx1.count() == n0 + 3
    assert canon(idx1) == canon(rebuilt1)
    # incremental: prior rows were reused, not re-derived — the new rows'
    # files are exactly the appended ones
    prior_files = {r.file for r in idx0.collect()}
    assert {r.file for r in idx1.collect()} >= prior_files

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_after"] < stats["files_before"]
    idx2 = refresh_file_stats(spark, path, ["o_totalprice"], idx1)
    rebuilt2 = file_stats_index(spark, path, ["o_totalprice"])
    assert canon(idx2) == canon(rebuilt2)
    # total row counts conserved through both refreshes
    assert (
        idx2.agg(F.sum("n_rows")).first()[0]
        == orders.count()
    )
    idx0.unpersist(); idx1.unpersist()


def test_merge_vacuum_retention(spark, tmp_path):
    """Snapshot retention: vacuum drops old versions, never the current
    one, and the table stays readable afterwards."""
    from praw_etl_student_dropout_spark.operators.merge import (
        list_versions,
        merge_upsert,
        read_merged,
        vacuum,
    )

    base = str(tmp_path / "merged")
    os.makedirs(base)
    for i in range(4):
        src = spark.range(5).select(
            F.col("id").alias("k"), F.lit(i).alias("gen")
        )
        merge_upsert(spark, base, src, ["k"])
    assert list_versions(base) == [0, 1, 2, 3]
    removed = vacuum(base, keep_last=2)
    assert removed == [0, 1]
    assert list_versions(base) == [2, 3]
    assert read_merged(spark, base).agg(F.max("gen")).first()[0] == 3
    # keep_last=1 keeps only the current version; vacuum is idempotent
    assert vacuum(base, keep_last=1) == [2]
    assert vacuum(base, keep_last=1) == []
    assert read_merged(spark, base).count() == 5


def test_merge_time_travel_reads_any_retained_version(spark, tmp_path):
    import pytest

    from praw_etl_student_dropout_spark.operators.merge import (
        merge_upsert,
        read_merged,
        vacuum,
    )

    base = str(tmp_path / "tt")
    os.makedirs(base)
    for i in range(3):
        src = spark.range(4).select(F.col("id").alias("k"), F.lit(i).alias("gen"))
        merge_upsert(spark, base, src, ["k"])
    # each retained snapshot reads back its own generation
    for v in (0, 1, 2):
        assert read_merged(spark, base, version=v).agg(F.max("gen")).first()[0] == v
    vacuum(base, keep_last=1)
    assert read_merged(spark, base).agg(F.max("gen")).first()[0] == 2
    with pytest.raises(FileNotFoundError, match="retained"):
        read_merged(spark, base, version=0)


def test_file_bloom_index_prunes_point_lookups(spark, tmp_path):
    """Per-file Bloom skipping index (round-7): a point lookup reads only
    the files whose filter admits the key — never missing the true file
    (no false negatives), pruning most others; an absent key prunes to
    an empty frame with the data schema; result parity with a full-scan
    filter."""
    from pyspark.sql import functions as F

    from praw_etl_student_dropout_spark.operators.maintenance import (
        file_bloom_index,
        pruned_read_bloom,
    )

    path = str(tmp_path / "tbl")
    # 8 files with disjoint key ranges
    for i in range(8):
        spark.createDataFrame(
            [(int(i * 1000 + j), f"v{i}_{j}") for j in range(50)], "k long, v string"
        ).coalesce(1).write.mode("append").parquet(path)

    idx = file_bloom_index(spark, path, "k").persist()
    try:
        n_files = idx.select("file").distinct().count()
        assert n_files == 8

        probe = 3007  # lives in file 3
        got = pruned_read_bloom(spark, idx, "k", probe).filter(F.col("k") == probe)
        full = spark.read.parquet(path).filter(F.col("k") == probe)
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in full.collect()}
        assert got.count() == 1

        # pruning: the candidate list is far smaller than the table
        import re

        cand = pruned_read_bloom(spark, idx, "k", probe)
        n_cand_files = len(
            {r[0] for r in cand.select(F.input_file_name()).distinct().collect()}
        )
        assert n_cand_files <= 2  # 8 KiB filter over 50 keys: ~no false positives

        # absent key: empty result, schema preserved
        missing = pruned_read_bloom(spark, idx, "k", 999_999)
        assert missing.count() == 0
        assert set(missing.columns) == {"k", "v"}
        assert re is not None
    finally:
        idx.unpersist()
