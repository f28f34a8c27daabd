"""Round-9 regression tests for VERDICT r8 item #4: the two driver-side
collects that had no structural bound now cap driver memory via
``limit(cap + 1)`` BEFORE collecting and fail loudly past the cap.

1. sampling.discover_fractions: a high-cardinality column passed as the
   stratum column raises instead of OOMing the driver; the limit is
   applied before the collect so even the failing path fetches at most
   max_strata + 1 rows.
2. stream_jobs.streaming_cms: a foreign/oversized parquet at
   sketch_path (anything beyond the depth*width cell contract) refuses
   the merge instead of collecting unbounded rows and overwriting the
   path with garbage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_discover_fractions_caps_strata(spark):
    from praw_etl_student_dropout_spark.operators.sampling import (
        discover_fractions,
    )

    df = spark.range(30).select(F.col("id").alias("stratum"))
    with pytest.raises(ValueError, match="more than 10 distinct"):
        discover_fractions(df, "stratum", default=0.5, max_strata=10)

    # Domains within the cap keep working, overrides included.
    ok = discover_fractions(
        df, "stratum", default=0.5, overrides={3: 1.0}, max_strata=50
    )
    assert len(ok) == 30
    assert ok[3] == 1.0
    assert ok[4] == 0.5


def test_streaming_cms_refuses_foreign_sketch(spark, sf_dir, tmp_path):
    from praw_etl_student_dropout_spark.sources.readers import load_tables
    from praw_etl_student_dropout_spark.streaming.stream_jobs import (
        read_event_stream,
        streaming_cms,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    src = tmp_path / "incoming"
    events.limit(50).coalesce(1).write.mode("overwrite").parquet(str(src))

    # Plant a parquet at sketch_path that BREAKS the depth*width=8 cell
    # contract (20 rows with the sketch's schema — e.g. a sketch built
    # with different parameters, or an unrelated table).
    sketch_path = tmp_path / "sketch"
    spark.range(20).select(
        (F.col("id") % 4).cast("int").alias("sketch_row"),
        F.col("id").cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("cnt"),
    ).coalesce(1).write.mode("overwrite").parquet(str(sketch_path))

    stream = read_event_stream(spark, str(src), schema=events.schema)
    with pytest.raises(Exception, match="depth\\*width=8 contract"):
        streaming_cms(
            stream,
            "user_id",
            str(sketch_path),
            str(tmp_path / "ckpt"),
            depth=2,
            width=4,
        )


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """merge_asof-style tolerance: matches older than the bound null out
    (the whole carried row, from the SAME matched row), left rows
    survive; within-bound matches are untouched; the no-tolerance path
    is unchanged."""
    from praw_etl_student_dropout_spark.operators.joins import asof_join

    versions = spark.createDataFrame(
        [(1, 10, "v1"), (1, 100, "v2"), (2, 50, "w1")],
        ["key", "vts", "version"],
    )
    probes = spark.createDataFrame(
        [(1, 15), (1, 400), (2, 55), (2, 40)], ["key", "pts"]
    )
    got = {
        (r.key, r.pts): r.version
        for r in asof_join(
            probes, versions, "key", "pts", "vts", ["version"],
            tolerance_seconds=30,
        ).collect()
    }
    assert got == {
        (1, 15): "v1",    # 5s stale, within 30
        (1, 400): None,   # v2 matched but 300s stale -> nulled
        (2, 55): "w1",    # 5s stale
        (2, 40): None,    # no match at all
    }

    # without tolerance the stale match still carries
    got_all = {
        (r.key, r.pts): r.version
        for r in asof_join(
            probes, versions, "key", "pts", "vts", ["version"]
        ).collect()
    }
    assert got_all[(1, 400)] == "v2"


def test_embedding_lsh_bucket_cap_sheds_hot_buckets(spark):
    """The SRP-LSH whole-bucket cap (round-9 scale guard: 2-bit bands go
    quadratic on unstructured corpora) drops exactly the over-full
    buckets: with a cap below the corpus size the degenerate
    all-identical corpus yields no pairs, while a genuine small dup
    cluster survives an adequate cap with values intact."""
    from praw_etl_student_dropout_spark.operators.dedup import (
        embedding_dup_md5_pairs,
    )

    # 40 identical vectors: every bucket holds all 40 rows.
    base = [float(i % 7 - 3) for i in range(8)]
    rows = [(i, base) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = embedding_dup_md5_pairs(
        df, "embedding", "vec_id", threshold=0.9, num_planes=16, bands=8,
        dim=8, max_bucket_size=10,
    )
    assert capped.count() == 0  # every bucket > 10 -> all dropped

    uncapped = embedding_dup_md5_pairs(
        df, "embedding", "vec_id", threshold=0.9, num_planes=16, bands=8,
        dim=8, max_bucket_size=100,
    )
    assert uncapped.count() == 40 * 39 // 2  # cluster survives whole
