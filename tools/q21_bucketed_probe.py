"""q21 on a bucketed-by-orderkey warehouse layout (round-7 VERDICT #2).

The round-6 one-pass rewrite left q21 as the single perf-watch query not
converging through the 2x gate: its floor is the ONE unavoidable
orders ⋈ lineitem shuffle plus per-core SMJ throughput. The warehouse
answer a 100 TB deployment would actually use is to pay that shuffle
once at LOAD time: write both fact tables bucketed (and sorted) by
orderkey, after which the orders join, the (order,supplier) collapse,
and the per-order windows ALL reuse the bucket distribution — the whole
query plans with zero exchanges.

This probe measures exactly that, paired against DuckDB on the same
replica data (same interleaved/min protocol as scale_probe --paired):

  1. build (or reuse) the N× key-shifted replicas,
  2. one-time: write lineitem+orders bucketed by orderkey (32 buckets,
     sorted) — the cost a deployment pays once per load,
  3. time q21 on the PLAIN replica layout, on the BUCKETED layout, and
     the DuckDB oracle on the same replicas, interleaved,
  4. assert the bucketed plan really is exchange-free.

Usage: python tools/q21_bucketed_probe.py [N ...] (default: 8 32)
Prints one JSON line: per-scale {plain_s, bucketed_s, duckdb_s, ratios,
bucketed_exchanges, bucket_write_s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_probe import SF_DIR, _duck_con, build_replicas

N_TIMED = 3
BUCKETS = 32


def _nation_sup(spark, sf_dir: str):
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        sup.join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name")
    )


def _q21_plain(spark, sf_dir: str):
    from praw_etl_student_dropout_spark.plans.catalog import q21_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ord_f = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    return q21_plan(li, ord_f, _nation_sup(spark, sf_dir))


def _q21_bucketed(spark, sf_dir: str, li_table: str, ord_table: str):
    from praw_etl_student_dropout_spark.plans.catalog import q21_plan

    li = spark.table(li_table).select("l_orderkey", "l_suppkey", "l_shipdate")
    ord_f = (
        spark.table(ord_table)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    return q21_plan(li, ord_f, _nation_sup(spark, sf_dir))


def _q21_agg(spark, sf_dir: str, li_table: str | None, ord_table: str | None):
    """Window-free variant: the per-order quantifiers as a SECOND
    aggregation on the same orderkey partitioning instead of window
    functions — rows reduce to one per ORDER before any further
    materialization (the window form materializes one per
    (order,supplier) and filters after). n_late_supp == 1 makes
    max(late supplier's name) well-defined, and every late row belongs
    to that sole supplier, so numwait survives the collapse."""
    from praw_etl_student_dropout_spark.plans.catalog import q21_plan  # noqa: F401

    if li_table is None:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_suppkey", "l_shipdate"
        )
        ord_f = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
    else:
        li = spark.table(li_table).select("l_orderkey", "l_suppkey", "l_shipdate")
        ord_f = (
            spark.table(ord_table)
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
    li2 = li.join(
        F.broadcast(_nation_sup(spark, sf_dir)),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left",
    )
    joined = li2.join(ord_f, F.col("o_orderkey") == F.col("l_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    os_agg = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(late, 1).otherwise(0)).alias("supp_late"),
        F.first("s_name").alias("s_name"),
        F.sum(F.when(late, 1).otherwise(0)).alias("late_rows"),
    )
    per_order = os_agg.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
        F.max(F.when(F.col("supp_late") == 1, F.col("s_name"))).alias("s_name"),
        F.sum(F.when(F.col("supp_late") == 1, F.col("late_rows"))).alias(
            "late_rows"
        ),
    )
    sole = per_order.filter(
        F.col("s_name").isNotNull()
        & (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
    )
    return sole.groupBy("s_name").agg(F.sum("late_rows").alias("numwait"))


def _ensure_preagg(spark, rep: str, table: str) -> float:
    """Round-11 third rung (VERDICT r10 #3): materialize the
    per-(orderkey, suppkey) lateness pre-agg AT LOAD TIME, bucketed and
    sorted by orderkey — the shared rollup both the semi (n_supp) and
    anti (n_late_supp) quantifier sides consume. The query then reads a
    12M-row pre-agg instead of merging 19M lineitem rows against
    orders: scan → window (rides the sorted buckets) → filter →
    broadcast name join. Returns the one-time write cost."""
    from praw_etl_student_dropout_spark.operators.bucketing import write_bucketed

    from pathlib import Path

    from praw_etl_student_dropout_spark.operators.bucketing import (
        _bucket_files_match,
    )

    if spark.catalog.tableExists(table):
        return 0.0
    path = f"{rep}/{table}"
    # Re-register ONLY a complete, layout-valid write (round-11 ADVICE):
    # a bare isdir() would silently register a partially written dir
    # from a killed probe run and produce wrong results/timings.
    if (
        os.path.isdir(path)
        and (Path(path) / "_SUCCESS").exists()
        and _bucket_files_match(Path(path), BUCKETS)
    ):
        ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) "
            f"INTO {BUCKETS} BUCKETS LOCATION '{path}'"
        )
        return 0.0
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    li = spark.read.parquet(f"{rep}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ord_f = (
        spark.read.parquet(f"{rep}/orders.parquet")
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
    t0 = time.perf_counter()
    write_bucketed(
        os_agg, table, ["l_orderkey"], num_buckets=BUCKETS,
        sort_keys=["l_orderkey"], path=path,
    )
    return round(time.perf_counter() - t0, 3)


def _q21_mv(spark, sf_dir: str, preagg_table: str):
    """q21 off the load-time pre-agg: window + filter + broadcast name
    join, zero joins over raw facts."""
    from pyspark.sql.window import Window

    os_agg = spark.table(preagg_table)
    w = Window.partitionBy("l_orderkey")
    per = os_agg.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("supp_late").over(w).alias("n_late_supp"),
    )
    sole = per.filter(
        (F.col("supp_late") == 1)
        & (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
    )
    named = sole.join(
        F.broadcast(_nation_sup(spark, sf_dir)),
        F.col("s_suppkey") == F.col("l_suppkey"),
    )
    return named.groupBy("s_name").agg(F.sum("late_rows").alias("numwait"))


def _exchanges(df) -> int:
    """SHUFFLE exchanges in the executed plan (broadcasts excluded: a
    BroadcastExchange of a dim/filter side is constant-sized traffic,
    not the data-proportional cost bucketing exists to remove)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )


def _ensure_bucketed(
    spark, rep: str, table: str, src: str, key: str,
    sort_keys: list[str] | None = None,
) -> float:
    """Write (or re-register) a bucketed table whose DATA lives under the
    replica dir. A fresh session's in-memory catalog forgets the table
    while the files persist — re-register the existing directory as an
    external bucketed table instead of rewriting (or crashing on
    LOCATION_ALREADY_EXISTS). ``sort_keys`` may extend the bucket key
    (e.g. (l_orderkey, l_suppkey)) so downstream per-key aggregates get
    their order free too — the key must stay the sort PREFIX or the
    join loses its sort elision."""
    from praw_etl_student_dropout_spark.operators.bucketing import write_bucketed

    sort_cols = ", ".join(sort_keys or [key])
    if spark.catalog.tableExists(table):
        return 0.0
    path = f"{rep}/{table}"
    if os.path.isdir(path):
        ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({sort_cols}) INTO {BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
        return 0.0
    t0 = time.perf_counter()
    write_bucketed(
        spark.read.parquet(f"{rep}/{src}.parquet"),
        table,
        [key],
        num_buckets=BUCKETS,
        sort_keys=sort_keys,
        path=path,
    )
    return round(time.perf_counter() - t0, 3)


def probe_scale(spark, n: int, scratch: str) -> dict:
    rep = f"{scratch}_{n}x"
    if not os.path.isdir(rep):
        print(f"# building {n}x replicas in {rep}", file=sys.stderr)
        build_replicas(spark, rep, n)

    # lineitem sorted by (l_orderkey, l_suppkey): l_orderkey stays the
    # sort PREFIX (the SMJ's elision holds) and the per-(order,supplier)
    # SortAggregate gets its two-key order from the scan as well —
    # distinct table name so the DDL re-register can never claim a sort
    # the files don't have.
    li_table, ord_table = f"li_bkt2_{n}x", f"ord_bkt_{n}x"
    bucket_write_s = _ensure_bucketed(
        spark, rep, li_table, "lineitem", "l_orderkey",
        sort_keys=["l_orderkey", "l_suppkey"],
    )
    bucket_write_s += _ensure_bucketed(spark, rep, ord_table, "orders", "o_orderkey")
    preagg_table = f"os_preagg_{n}x"
    preagg_write_s = _ensure_preagg(spark, rep, preagg_table)

    from praw_etl_student_dropout_spark.plans import catalog_all

    oracle = catalog_all()["q21_waiting_supplier"].oracle
    con = _duck_con(rep, plain=False)

    variants = {
        "plain": lambda: _q21_plain(spark, rep),
        "bucketed": lambda: _q21_bucketed(spark, rep, li_table, ord_table),
        "agg_plain": lambda: _q21_agg(spark, rep, None, None),
        "agg_bucketed": lambda: _q21_agg(spark, rep, li_table, ord_table),
        "mv_preagg": lambda: _q21_mv(spark, rep, preagg_table),
    }
    for v in variants.values():  # warm-ups
        v().count()
    con.sql(oracle).fetchall()

    times: dict[str, list[float]] = {k: [] for k in variants}
    duck_s: list[float] = []
    for _ in range(N_TIMED):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().count()
            times[k].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.sql(oracle).fetchall()
        duck_s.append(time.perf_counter() - t0)
    con.close()

    # correctness on the replicas: every variant == plain
    expect = {tuple(r) for r in variants["plain"]().collect()}
    for k, v in variants.items():
        assert {tuple(r) for r in v().collect()} == expect, f"{k} diverged"

    res: dict = {f"{k}_s": round(min(ts), 3) for k, ts in times.items()}
    res["duckdb_s"] = round(min(duck_s), 3)
    res["bucket_write_s"] = round(bucket_write_s, 3)
    res["preagg_write_s"] = round(preagg_write_s, 3)
    res["bucketed_exchanges"] = _exchanges(variants["bucketed"]())
    res["agg_bucketed_exchanges"] = _exchanges(variants["agg_bucketed"]())
    res["rows"] = len(expect)
    for k in variants:
        res[f"ratio_{k}"] = round(res[f"{k}_s"] / res["duckdb_s"], 2)
    print(f"# {n}x: {res}", file=sys.stderr)
    return res


def main() -> None:
    from praw_etl_student_dropout_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 32]
    spark = get_spark(app_name="q21_bucketed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # JVM warm
    out = {"buckets": BUCKETS, "scales": {}}
    for n in scales:
        out["scales"][str(n)] = probe_scale(spark, n, "/tmp/spark_graft_scale")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
