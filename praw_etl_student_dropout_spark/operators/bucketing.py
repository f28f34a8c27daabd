"""Bucketed (co-located) tables — the shuffle-elimination path for
repeated large⨯large joins (SURVEY.md §2.3 J4 at scale).

A plain equi-join of two fact-sized tables shuffles BOTH sides every
query. Writing each side bucketed (and sorted) by the join key pins rows
to hash buckets at write time; Spark's bucketed scan then feeds a
sort-merge join with ZERO exchanges — the per-query shuffle is paid once,
at load. At 100 TB this converts the dominant recurring cost of a
fact-to-fact join (e.g. orders ⋈ lineitem on orderkey) into a one-time
layout decision, and composes with partition pruning (partitionBy date,
bucketBy key).

Bucket counts must match (or divide) across join sides; keep them a
power of two so a table can be re-bucketed coarser without a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .joins import broadcast_if_dim


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int = 32,
    sort_keys: list[str] | None = None,
    path: str | None = None,
    one_file_per_bucket: bool = True,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. ``sort_keys`` default to the bucket keys.

    ``one_file_per_bucket`` (default True) repartitions by the bucket
    keys into ``num_buckets`` tasks before writing — HashPartitioning
    and bucket-id assignment share the same Murmur3-pmod function, so
    each task holds exactly one bucket and writes exactly ONE file.
    This is what makes the sortBy metadata USABLE: Spark's bucketed
    scan only reports its outputOrdering when every bucket is a single
    file (multi-file buckets are only sorted per file), so without it a
    downstream sort-merge join silently RE-SORTS both sides per task —
    measured round-10 as the dominant per-core cost of the whole
    bucketed-join family (the default writer lays out
    input-partitions × buckets files: 1,024 at the 32× probe). The
    one-shuffle write cost is the same shuffle the layout exists to
    amortize. Set False only for parallel-restricted writers where the
    num_buckets-task write is the bottleneck.
    """
    from pyspark.sql import functions as F

    if one_file_per_bucket:
        df = df.repartition(num_buckets, *[F.col(k) for k in bucket_keys])
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*(sort_keys or bucket_keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same keys/bucket count: the plan is exchange-free (asserted in
    tests/test_plans.py). Any extra filters/projections compose on the
    returned DataFrame and still prune the bucketed scan."""
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)


def _bucket_files_match(path, num_buckets: int) -> bool:
    """True iff the parquet files under ``path`` are a valid one-file-
    per-bucket layout for ``num_buckets``: every filename carries a
    parseable bucket id (part-NNNNN-<uuid>_BBBBB.*), no two files share
    one, and all ids are < num_buckets. Anything else means the files
    were written under a different spec — rewrite, never re-register.

    A PARTITIONED bucketed layout (the q21 refresh MV: ``o_year=YYYY/``
    subdirectories, round-13) validates per partition directory — the
    one-file-per-bucket contract holds within each partition."""
    import re

    files = [f for f in path.iterdir() if f.suffix == ".parquet"]
    if not files:
        parts = [
            d for d in path.iterdir() if d.is_dir() and "=" in d.name
        ]
        return bool(parts) and all(
            _bucket_files_match(d, num_buckets) for d in parts
        )
    if len(files) > num_buckets:
        return False
    ids = []
    for f in files:
        m = re.search(r"_(\d{5})\.", f.name)
        if m is None:
            return False
        ids.append(int(m.group(1)))
    return len(set(ids)) == len(ids) and all(0 <= b < num_buckets for b in ids)


def ensure_bucketed_pair(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> tuple[str, str]:
    """Materialize (once per fixture dir) the load-time warehouse layout
    the q21/q3/d2/q17 family deploys on: lineitem and orders bucketed by
    orderkey, one file per bucket, lineitem sorted (l_orderkey,
    l_suppkey) so the join takes the prefix and per-(order, supplier)
    aggregates ride the same order. Data lives under the repo scratch
    dir (the j7 ensure_orders_by_year pattern); a fresh session
    re-registers the existing files as external bucketed tables — the
    DDL always states exactly the sort the writer used, never more.
    Returns the (lineitem, orders) table names for this sf_dir.

    The scratch path AND table name encode ``num_buckets`` (round-10
    ADVICE): a later call with a different bucket count must never
    re-register existing files with an ``INTO N BUCKETS`` clause that
    disagrees with the bucket ids baked into the filenames — a
    co-located SMJ over mismatched buckets joins silently wrong. As a
    second line of defense, re-registration validates the on-disk
    bucket-id range against ``num_buckets`` before trusting the files."""
    from pathlib import Path

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables

    tag = f"{Path(sf_dir).name}_b{num_buckets}".replace(".", "_").replace("-", "_")
    spec = {
        "lineitem": ("l_orderkey", ["l_orderkey", "l_suppkey"]),
        "orders": ("o_orderkey", ["o_orderkey"]),
    }
    names = {}
    for src, (key, sort) in spec.items():
        table = f"bkt_{src}_{tag}"
        names[src] = table
        path = (
            _scratch_root()
            / "bucketed"
            / f"{Path(sf_dir).name}_b{num_buckets}"
            / src
        )
        if spark.catalog.tableExists(table):
            # A registered table only short-circuits while its files are
            # still on disk (ADVICE r12: a gc sweep between sessions'
            # registrations would otherwise strand this session on a
            # swept location until it drops the table). Missing marker →
            # drop and rebuild below.
            if (path / "_SUCCESS").exists():
                continue
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        if (path / "_SUCCESS").exists() and _bucket_files_match(path, num_buckets):
            ddl = spark.read.parquet(str(path)).schema.toDDL()
            spark.sql(
                f"CREATE TABLE {table} ({ddl}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({', '.join(sort)}) "
                f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
            )
        else:
            write_bucketed(
                load_tables(spark, sf_dir, [src])[src],
                table,
                [key],
                num_buckets=num_buckets,
                sort_keys=sort,
                path=str(path),
            )
    return names["lineitem"], names["orders"]


def ensure_q21_preagg(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> str:
    """Materialize (once per fixture dir) the q21 LOAD-TIME pre-aggregate
    — the round-11 `mv_preagg` probe rung promoted to an engine layout
    (VERDICT r11 #2): one row per (l_orderkey, l_suppkey) of a finished
    order, carrying that supplier's lateness flag and late row count,
    bucketed AND sorted by l_orderkey, one file per bucket.

    This is the materialized-view contract for the q21 quantifier family:
    both the EXISTS (n_supp) and NOT-EXISTS (n_late_supp) sides consume
    exactly this rollup, so the query becomes scan → per-order window
    (riding the sorted buckets, exchange-free) → filter → broadcast name
    join — it never merges raw lineitem against orders at read time. The
    only measured configuration that held the ≤2.5× gate at the 32× probe
    (0.69-0.96 s vs DuckDB 0.38-0.43, SCALE_r11 §q21_third_rung).

    Layout-safety contract (round-10/11 ADVICE hardening, same as
    ensure_bucketed_pair): the scratch path and table name encode
    ``num_buckets``; an existing directory is re-registered only when its
    ``_SUCCESS`` marker exists and every file's baked-in bucket id fits
    the spec — anything else is rewritten, never trusted.
    """
    from pathlib import Path

    from pyspark.sql import functions as F

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables

    tag = f"{Path(sf_dir).name}_b{num_buckets}".replace(".", "_").replace("-", "_")
    table = f"bkt_q21preagg_{tag}"
    path = (
        _scratch_root()
        / "bucketed"
        / f"{Path(sf_dir).name}_b{num_buckets}"
        / "q21_preagg"
    )
    if spark.catalog.tableExists(table):
        # Same gc-vs-warm-session guard as ensure_bucketed_pair (ADVICE
        # r12): trust the registration only while the files exist.
        if (path / "_SUCCESS").exists():
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if (path / "_SUCCESS").exists() and _bucket_files_match(path, num_buckets):
        ddl = spark.read.parquet(str(path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) "
            f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
        )
        return table
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    ord_f = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    os_agg = (
        li.join(ord_f, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(F.when(late, 1).otherwise(0)).alias("supp_late"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_rows"),
        )
    )
    write_bucketed(
        os_agg,
        table,
        ["l_orderkey"],
        num_buckets=num_buckets,
        sort_keys=["l_orderkey"],
        path=str(path),
    )
    return table


#: The q21 incremental-MV delta batch (round-13, VERDICT r12 #4): "the
#: remaining line items (linenumber ≥ 4) of orders placed on/after
#: 2000-07-01 arrive as a late fact batch" — ~9% of lineitem. The cut is
#: on the ORDER date because the MV partitions by order year (the
#: fixture's ship dates are decoupled from order dates — lag −2383..
#: +2478 days — so a ship-date delta would touch every partition): this
#: delta confines the rewrite to o_year ∈ {2000, 2001}, leaving
#: 1995-1999 untouched on disk, while still producing (orderkey,
#: suppkey) groups that OVERLAP base groups (37 at sf0.01, 2 of which
#: flip the lateness flag), so the max/sum merge is exercised for real.
Q21_DELTA_ORDER_CUT = "2000-07-01"
Q21_DELTA_LINE_MIN = 4

#: Encoded into the MV scratch paths and table names (the num_buckets
#: lesson, round-10 ADVICE, applied to the delta SPEC): a change to the
#: cut constants must never re-register layouts built under the old
#: spec — the base/live content is a function of the spec, and a stale
#: short-circuit silently grades wrong values.
_Q21_DELTA_TAG = (
    f"d{Q21_DELTA_ORDER_CUT.replace('-', '')}l{Q21_DELTA_LINE_MIN}"
)

_Q21_MV_DDL = (
    "(l_orderkey BIGINT, l_suppkey BIGINT, supp_late INT, "
    "late_rows BIGINT, o_year INT) USING parquet PARTITIONED BY (o_year) "
    "CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey)"
)

_Q21_LATE = "l_shipdate > o_orderdate + INTERVAL 90 DAYS"


def _q21_group_partials(joined: DataFrame) -> DataFrame:
    """Per-(l_orderkey, l_suppkey, o_year) lateness partials over an
    already-joined lineitem×orders(F) frame — the algebraic (max/sum)
    partial aggregate both the base build and the delta refresh fold."""
    late = F.expr(_Q21_LATE)
    return joined.groupBy(
        "l_orderkey",
        "l_suppkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        F.max(F.when(late, 1).otherwise(0)).cast("int").alias("supp_late"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_rows"),
    )


def _write_q21_mv(df, table: str, path, num_buckets: int) -> None:
    (
        df.select("l_orderkey", "l_suppkey", "supp_late", "late_rows", "o_year")
        .repartition(num_buckets, F.col("l_orderkey"))
        .write.format("parquet")
        .mode("overwrite")
        .partitionBy("o_year")
        .bucketBy(num_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(path))
        .saveAsTable(table)
    )


def ensure_q21_mv_pair(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> tuple[str, str, str]:
    """Materialize (once per fixture dir) the q21 incremental-MV triple
    (round-13, VERDICT r12 #4 — the maintenance half of the
    materialized-view contract whose static half is
    :func:`ensure_q21_preagg`):

    - **base table** — the lateness pre-agg computed WITHOUT the delta
      slice (orders before :data:`Q21_DELTA_ORDER_CUT` keep all line
      items; later orders only line numbers < :data:`Q21_DELTA_LINE_MIN`)
      — the MV as it stood before the delta batch arrived. Immutable;
      the refresh always folds against it, which is what makes
      :func:`refresh_q21_preagg` idempotent.
    - **live table** — the refresh target, initialized to the same
      content.
    - **delta batch** — the held-out lineitem rows written as a plain
      parquet directory under the ``part/`` scratch family: the
      appended fact batch a warehouse receives, so the refresh reads
      exactly O(delta) bytes instead of re-filtering the full fact.

    The MV tables are PARTITIONED by the order year and bucketed+sorted
    by l_orderkey within each partition (one file per partition×bucket)
    — the year partitioning is what lets a delta refresh rewrite only
    the partitions its rows touch, and the bucketing keeps the
    read-side per-order window exchange-free. Re-registration in a
    fresh session follows the ensure_bucketed_pair contract (_SUCCESS +
    per-partition bucket-id validation, DDL stating exactly the
    writer's layout) plus ``MSCK REPAIR`` to discover partition
    directories.

    Returns ``(base_table, live_table, delta_batch_path)``.
    """
    from pathlib import Path

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables

    tag = f"{Path(sf_dir).name}_b{num_buckets}".replace(".", "_").replace("-", "_")

    def _joined_with_flag():
        li_t, ord_t = ensure_bucketed_pair(spark, sf_dir, num_buckets=num_buckets)
        li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
            "l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber"
        )
        ord_f = (
            spark.table(ord_t)
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
        in_delta = (
            F.col("o_orderdate")
            >= F.lit(Q21_DELTA_ORDER_CUT).cast("date")
        ) & (F.col("l_linenumber") >= Q21_DELTA_LINE_MIN)
        return (
            li.join(ord_f, F.col("o_orderkey") == F.col("l_orderkey")),
            in_delta,
        )

    delta_path = (
        _scratch_root()
        / "part"
        / Path(sf_dir).name
        / f"q21_delta_batch_{_Q21_DELTA_TAG}"
    )
    joined = None
    if not (delta_path / "_SUCCESS").exists():
        joined, in_delta = _joined_with_flag()
        (
            joined.filter(in_delta)
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .write.mode("overwrite")
            .parquet(str(delta_path))
        )

    names = {}
    base_df = None
    for kind in ("base", "live"):
        table = f"bkt_q21{kind}_{_Q21_DELTA_TAG}_{tag}"
        names[kind] = table
        path = (
            _scratch_root()
            / "bucketed"
            / f"{Path(sf_dir).name}_b{num_buckets}"
            / f"q21_preagg_{kind}_{_Q21_DELTA_TAG}"
        )
        if spark.catalog.tableExists(table):
            if (path / "_SUCCESS").exists():
                continue
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        if (path / "_SUCCESS").exists() and _bucket_files_match(path, num_buckets):
            spark.sql(
                f"CREATE TABLE {table} {_Q21_MV_DDL} "
                f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
            )
            spark.sql(f"MSCK REPAIR TABLE {table}")
            continue
        if base_df is None:
            if joined is None:
                joined, in_delta = _joined_with_flag()
            base_df = _q21_group_partials(joined.filter(~in_delta))
        _write_q21_mv(base_df, table, path, num_buckets)
    return names["base"], names["live"], str(delta_path)


def refresh_q21_preagg(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> str:
    """Incrementally fold the delta batch (the held-out late-arriving
    lineitem rows materialized by :func:`ensure_q21_mv_pair`) into the
    live q21 pre-agg — the a25_incremental_agg partial-merge pattern
    applied to the materialized-view layout:

    1. read the delta batch — O(delta) bytes by construction — and
       join it against the orders side of the j18 bucketed layout
       (only the delta shuffles; orders is already bucket-partitioned
       by orderkey), then fold the per-(l_orderkey, l_suppkey, o_year)
       partials;
    2. the affected partitions are the delta's distinct order years; the
       base MV is read ONLY for those years (broadcast semi-join on the
       partition column → partition-pruned scan);
    3. merge = union → re-aggregate with the algebraic combiners
       (max for the lateness flag, sum for the late-row count — partial
       aggs merge losslessly);
    4. dynamic-partition-overwrite INTO the live table: only the
       affected ``o_year=`` directories are rewritten, unaffected years'
       files are untouched — refresh cost scales with the delta and its
       partition locality, never with the base.

    Idempotent by construction: the merge reads the immutable BASE
    layout, never the live table, so re-running converges instead of
    double-counting ``late_rows``. Returns the live table name; after a
    refresh the live MV equals the pre-agg over ALL lineitems, which is
    what the graded entry value-proves against the full Q21 oracle on
    the plain tables.
    """
    base_t, live_t, delta_path = ensure_q21_mv_pair(
        spark, sf_dir, num_buckets=num_buckets
    )
    _, ord_t = ensure_bucketed_pair(spark, sf_dir, num_buckets=num_buckets)
    # Every delta row belongs to an order placed on/after the cut BY
    # CONSTRUCTION of the delta batch, so the orders side is pre-sliced
    # on the same predicate — an exact filter that keeps the join's
    # orders leg proportional to the recent-order slice instead of the
    # whole history (at warehouse scale this is the orders table's own
    # date-partition pruning).
    ord_f = (
        spark.table(ord_t)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (
                F.col("o_orderdate")
                >= F.lit(Q21_DELTA_ORDER_CUT).cast("date")
            )
        )
        .select("o_orderkey", "o_orderdate")
    )
    delta_li = spark.read.parquet(delta_path)
    delta = _q21_group_partials(
        delta_li.join(ord_f, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    years = delta.select("o_year").distinct()
    base_touched = spark.table(base_t).join(
        F.broadcast(years), "o_year", "left_semi"
    )
    merged = (
        base_touched.unionByName(delta)
        .groupBy("l_orderkey", "l_suppkey", "o_year")
        .agg(
            F.max("supp_late").cast("int").alias("supp_late"),
            F.sum("late_rows").cast("long").alias("late_rows"),
        )
    )
    out = merged.select(
        "l_orderkey", "l_suppkey", "supp_late", "late_rows", "o_year"
    ).repartition(num_buckets, F.col("l_orderkey"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").insertInto(live_t)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return live_t


#: Snapshot-layout spec (round-14, VERDICT r13 #6): the materialized
#: events-CDC snapshot cut. Encoded into the scratch path and table name
#: (the Q21_DELTA_TAG lesson): changing the cut must never re-register a
#: layout built under the old one.
EVENTS_SNAPSHOT_T0 = "2024-01-20 00:00:00"
_SNAP_T0_TAG = "t" + EVENTS_SNAPSHOT_T0[:10].replace("-", "")


def events_cdc_log(events: DataFrame) -> DataFrame:
    """The deterministic CDC-feed stand-in shared by the whole changelog
    family (etl_changelog_compact established it): signup→I, error→D,
    else U, with (ts, event_id) as the total order and value as the
    payload."""
    from pyspark.sql import functions as F

    return events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )


def ensure_events_snapshot(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> str:
    """Materialize (once per fixture dir) the events-CDC table state AS
    OF ``EVENTS_SNAPSHOT_T0`` (operators/etl.snapshot_asof over
    events_cdc_log), bucketed by user_id — the persisted half of the
    snapshot-refresh rung (VERDICT r13 #6): etl_snapshot_refresh folds
    only the (T0, T1] delta into this layout instead of rescanning the
    full changelog, so advancing the snapshot costs O(delta), and the
    merge join rides the bucket distribution instead of reshuffling the
    snapshot. Same layout-safety contract as ensure_q21_preagg: path and
    table name encode the bucket count AND the T0 cut; _SUCCESS +
    baked-in bucket ids are re-verified before any re-registration.
    """
    from pathlib import Path

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables
    from .etl import snapshot_asof

    from pyspark.sql import functions as F

    tag = f"{Path(sf_dir).name}_b{num_buckets}".replace(".", "_").replace("-", "_")
    table = f"bkt_events_snap_{_SNAP_T0_TAG}_{tag}"
    path = (
        _scratch_root()
        / "bucketed"
        / f"{Path(sf_dir).name}_b{num_buckets}"
        / f"events_snap_{_SNAP_T0_TAG}"
    )
    if spark.catalog.tableExists(table):
        if (path / "_SUCCESS").exists():
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if (path / "_SUCCESS").exists() and _bucket_files_match(path, num_buckets):
        ddl = spark.read.parquet(str(path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY (user_id) SORTED BY (user_id) "
            f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
        )
        return table
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    log = events_cdc_log(ev).filter(
        F.col("ts") <= F.lit(EVENTS_SNAPSHOT_T0).cast("timestamp")
    )
    snap = snapshot_asof(log, "user_id", ["ts", "event_id"])
    write_bucketed(
        snap,
        table,
        ["user_id"],
        num_buckets=num_buckets,
        sort_keys=["user_id"],
        path=str(path),
    )
    return table


#: SCD2-history-layout spec (round-14): the materialized type-2 version
#: history cut. Own constant (not EVENTS_SNAPSHOT_T0) so the two CDC
#: families' cuts can move independently; encoded into the scratch path
#: and table name (the Q21_DELTA_TAG lesson).
SCD2_T0 = "2024-01-20 00:00:00"
_SCD2_T0_TAG = "t" + SCD2_T0[:10].replace("-", "")


def ensure_scd2_history(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> str:
    """Materialize (once per fixture dir) the SCD2 version history AS
    OF ``SCD2_T0`` (operators/etl.scd2_history over events), bucketed
    by user_id — the persisted half of the SCD2 apply rung:
    etl_scd2_apply folds only the (T0, T1] event delta into this
    layout, so advancing the history costs O(delta) and the touched-key
    joins ride the bucket distribution. Same layout-safety contract as
    ensure_events_snapshot: path and table name encode the bucket count
    AND the T0 cut; _SUCCESS + baked-in bucket ids are re-verified
    before any re-registration.
    """
    from pathlib import Path

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables
    from .etl import scd2_history

    from pyspark.sql import functions as F

    tag = f"{Path(sf_dir).name}_b{num_buckets}".replace(".", "_").replace("-", "_")
    table = f"bkt_scd2_hist_{_SCD2_T0_TAG}_{tag}"
    path = (
        _scratch_root()
        / "bucketed"
        / f"{Path(sf_dir).name}_b{num_buckets}"
        / f"scd2_hist_{_SCD2_T0_TAG}"
    )
    if spark.catalog.tableExists(table):
        if (path / "_SUCCESS").exists():
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if (path / "_SUCCESS").exists() and _bucket_files_match(path, num_buckets):
        ddl = spark.read.parquet(str(path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY (user_id) SORTED BY (user_id) "
            f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
        )
        return table
    ev = load_tables(spark, sf_dir, ["events"])["events"].filter(
        F.col("ts") <= F.lit(SCD2_T0).cast("timestamp")
    )
    hist = scd2_history(ev, "user_id", "event_type", ["ts", "event_id"])
    write_bucketed(
        hist,
        table,
        ["user_id"],
        num_buckets=num_buckets,
        sort_keys=["user_id"],
        path=str(path),
    )
    return table


def ensure_nation_trade_pairs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture dir) the canonical nation trade-
    graph edge list ``(ea < eb, vol)`` — the shared derivation under all
    eight u9_* graph entries (VERDICT r13 #5: it cost ~1.0 s warm at the
    32× probe and was recomputed per query; it is a deterministic
    function of lineitem/orders/customer/supplier, so it is a layout,
    not a per-query plan). ≤ nations² rows, written as one parquet file
    under the ``part/`` scratch family (plain _SUCCESS validation — the
    frame is too small for bucketing to mean anything). The derivation
    itself keeps the round-12 lean shape: dims broadcast onto their
    fact sides, the one data-proportional join riding the load-time
    bucketed (lineitem, orders) layout, then a map-side-combined pair
    census. The path encodes a derivation version: if the census
    definition ever changes, v-bump so stale layouts can never grade
    wrong values (the Q21_DELTA_TAG lesson)."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables

    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    table = f"ntp_v1_{tag}"
    path = _scratch_root() / "part" / Path(sf_dir).name / "nation_trade_pairs_v1"
    if spark.catalog.tableExists(table):
        if (path / "_SUCCESS").exists():
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if (path / "_SUCCESS").exists():
        ddl = spark.read.parquet(str(path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet LOCATION '{path}'"
        )
        return table
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    li_t, ord_t = ensure_bucketed_pair(spark, sf_dir)
    li = (
        spark.table(li_t)
        .select("l_orderkey", "l_suppkey")
        .join(
            broadcast_if_dim(
                t["supplier"].select("s_suppkey", "s_nationkey"),
                bounded=False,
                why="SF-proportional dim; AQE decides",
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select("l_orderkey", "s_nationkey")
    )
    orders = (
        spark.table(ord_t)
        .select("o_orderkey", "o_custkey")
        .join(
            broadcast_if_dim(
                t["customer"].select("c_custkey", "c_nationkey"),
                bounded=False,
                why="SF-proportional dim; AQE decides",
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("o_orderkey", "c_nationkey")
    )
    pairs = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("ea"),
            F.greatest("s_nationkey", "c_nationkey").alias("eb"),
        )
        .agg(F.count(F.lit(1)).alias("vol"))
        .coalesce(1)
    )
    pairs.write.mode("overwrite").option("path", str(path)).saveAsTable(table)
    return table


def ensure_nation_trade_directed(spark: SparkSession, sf_dir: str) -> str:
    """Directed companion of ``ensure_nation_trade_pairs`` — the
    ``(src = supplier nation, dst = customer nation, vol)`` census that
    u9_pagerank_nations ranks over (direction matters for PageRank and
    self-loops are legitimate mass, so this is a DIFFERENT deterministic
    derivation, not a view of the canonical one). Same layout contract:
    ≤ nations² rows, one parquet file under ``part/``, derivation
    version in the path so a census change can never grade through a
    stale layout. Before r14 pagerank re-derived this per run — the 32×
    probe read 11.0 s, almost all of it the SF-proportional fact join
    replayed under the 12 power-iteration rounds."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables

    tag = Path(sf_dir).name.replace(".", "_").replace("-", "_")
    table = f"ntd_v1_{tag}"
    path = _scratch_root() / "part" / Path(sf_dir).name / "nation_trade_directed_v1"
    if spark.catalog.tableExists(table):
        if (path / "_SUCCESS").exists():
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if (path / "_SUCCESS").exists():
        ddl = spark.read.parquet(str(path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet LOCATION '{path}'"
        )
        return table
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    li_t, ord_t = ensure_bucketed_pair(spark, sf_dir)
    li = (
        spark.table(li_t)
        .select("l_orderkey", "l_suppkey")
        .join(
            broadcast_if_dim(
                t["supplier"].select("s_suppkey", "s_nationkey"),
                bounded=False,
                why="SF-proportional dim; AQE decides",
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select("l_orderkey", "s_nationkey")
    )
    orders = (
        spark.table(ord_t)
        .select("o_orderkey", "o_custkey")
        .join(
            broadcast_if_dim(
                t["customer"].select("c_custkey", "c_nationkey"),
                bounded=False,
                why="SF-proportional dim; AQE decides",
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("o_orderkey", "c_nationkey")
    )
    pairs = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("vol"))
        .coalesce(1)
    )
    pairs.write.mode("overwrite").option("path", str(path)).saveAsTable(table)
    return table


#: IVF index spec (round-14, VERDICT r13 #4): centroid count and the
#: base/delta split modulus, encoded into every path and table name —
#: changing either must never re-register layouts built under the old
#: spec (the Q21_DELTA_TAG lesson). vec_id % IVF_DELTA_MOD == 0 rows are
#: the "arrived after the index build" stand-in (the doc_id % 97 split
#: pattern); the index is built on the other 90%.
IVF_NUM_CENTROIDS = 16
IVF_DELTA_MOD = 10
_IVF_TAG = f"v1_k{IVF_NUM_CENTROIDS}_d{IVF_DELTA_MOD}"


def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> tuple[str, str]:
    """Materialize (once per fixture dir) the persisted IVF index the
    u7 family queries against (VERDICT r13 #4): until round 13 every
    IVF entry recomputed centroids + assignments per run — at 100 TB
    the index is a MAINTAINED LAYOUT, not a per-query derivation.

    Two tables, returned as ``(centroids, assignments)``:

    - centroids (``part/`` family, k rows): deterministic hash-spread
      seed set (operators/similarity.sample_centroids) over the BASE
      corpus — vec_id % IVF_DELTA_MOD != 0; the held-out tenth is the
      post-build arrivals stand-in that u7_ivf_persisted routes to
      these centroids at read time (the append-buffer every real ANN
      deployment keeps between compactions).
    - assignments (``bucketed/`` family): (vec_id, embedding,
      centroid_id) for the base corpus, bucketed AND sorted by
      centroid_id, one file per bucket — the probe equi-join on
      centroid_id rides this distribution, so a query touches only the
      nprobe lists' buckets and never reshuffles the corpus.

    Same layout-safety contract as ensure_q21_preagg: paths and table
    names encode the spec tag and bucket count; _SUCCESS + baked-in
    bucket ids are re-verified before any re-registration.
    """
    from pathlib import Path

    from ..sources.partitioned import _scratch_root
    from ..sources.readers import load_tables
    from .similarity import assign_centroids, sample_centroids

    fixture = Path(sf_dir).name
    tag = f"{fixture}_b{num_buckets}".replace(".", "_").replace("-", "_")
    cent_table = f"ivf_centroids_{_IVF_TAG}_{tag}"
    asg_table = f"bkt_ivf_assign_{_IVF_TAG}_{tag}"
    cent_path = _scratch_root() / "part" / fixture / f"ivf_centroids_{_IVF_TAG}"
    asg_path = (
        _scratch_root() / "bucketed" / f"{fixture}_b{num_buckets}" / f"ivf_assign_{_IVF_TAG}"
    )

    cent_ok = spark.catalog.tableExists(cent_table) and (
        cent_path / "_SUCCESS"
    ).exists()
    asg_ok = spark.catalog.tableExists(asg_table) and (
        asg_path / "_SUCCESS"
    ).exists()
    if cent_ok and asg_ok:
        return cent_table, asg_table
    for tbl in (cent_table, asg_table):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    if (cent_path / "_SUCCESS").exists():
        ddl = spark.read.parquet(str(cent_path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {cent_table} ({ddl}) USING parquet "
            f"LOCATION '{cent_path}'"
        )
    else:
        base = load_tables(spark, sf_dir, ["embeddings"])["embeddings"].filter(
            F.col("vec_id") % IVF_DELTA_MOD != 0
        )
        sample_centroids(base, IVF_NUM_CENTROIDS).coalesce(1).write.mode(
            "overwrite"
        ).option("path", str(cent_path)).saveAsTable(cent_table)

    if (asg_path / "_SUCCESS").exists() and _bucket_files_match(
        asg_path, num_buckets
    ):
        ddl = spark.read.parquet(str(asg_path)).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {asg_table} ({ddl}) USING parquet "
            f"CLUSTERED BY (centroid_id) SORTED BY (centroid_id) "
            f"INTO {num_buckets} BUCKETS LOCATION '{asg_path}'"
        )
    else:
        base = load_tables(spark, sf_dir, ["embeddings"])["embeddings"].filter(
            F.col("vec_id") % IVF_DELTA_MOD != 0
        )
        assigned = assign_centroids(base, spark.table(cent_table))
        write_bucketed(
            assigned,
            asg_table,
            ["centroid_id"],
            num_buckets=num_buckets,
            sort_keys=["centroid_id"],
            path=str(asg_path),
        )
    return cent_table, asg_table
