"""Round-10 star-family floor probe (VERDICT r9 #3 + #6).

Three questions, one paired protocol (same interleave/min discipline as
scale_probe --paired, on the same 32x key-shifted replicas):

1. SCAN FLOOR (#3): how much of the q3/q8/q17/q21 residual is the
   per-core parquet scan itself? Times a scan-only leg — aggregate
   EXACTLY the columns each query reads, no joins — Spark vs DuckDB on
   the same replica files. If scan-only already costs >=80% of the full
   query, the residual is the measured per-core columnar-decode floor
   (BASELINE round-7), not a plan problem.

2. SCAN LEVERS (#3): re-times the scan leg under the two cheap knobs —
   spark.sql.parquet.columnarReaderBatchSize (4096 default -> 8192 /
   16384) and spark.sql.files.maxPartitionBytes (128m default -> 64m,
   i.e. 2x more splits) — to confirm (or refute) that the floor doesn't
   move for free.

3. BUCKETED RUNGS (#6): q8 on the orderkey-bucketed lineitem+orders
   layout (the q21/q3 tables: l⋈o goes bucket-local, every dim
   broadcasts — the seven-table star drops to broadcast-only +
   bucket-local agg) and q17 on a lineitem table bucketed by l_partkey
   (its ONLY data-proportional exchange: the per-part average and the
   broadcast-back join both reuse the bucket distribution). Exchange
   counts asserted from the executed plan; outputs value-checked
   against the catalog plans on the same replicas.

Usage: python tools/star_floor_probe.py [N ...]   (default: 32)
Prints one JSON line for SCALE_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.q21_bucketed_probe import BUCKETS, _ensure_bucketed, _exchanges
from tools.scale_probe import SF_DIR, _duck_con, build_replicas

N_TIMED = 3

# The exact column set each weak query decodes from lineitem.
SCAN_SETS = {
    "q21_cols3": (
        ["l_orderkey", "l_suppkey", "l_shipdate"],
        "sum(l_orderkey), sum(l_suppkey), max(l_shipdate), count(*)",
    ),
    "q17_cols2": (
        ["l_partkey", "l_quantity"],
        "sum(l_partkey), sum(l_quantity), count(*)",
    ),
    "q8_cols5": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        "sum(l_orderkey), sum(l_partkey), sum(l_suppkey), "
        "sum(l_extendedprice), sum(l_discount), count(*)",
    ),
}

LEVERS = {
    "default": {},
    "batch8192": {"spark.sql.parquet.columnarReaderBatchSize": "8192"},
    "batch16384": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
    "mpb64m": {"spark.sql.files.maxPartitionBytes": "67108864"},
}


def _spark_scan(spark, path: str, cols: list[str]):
    df = spark.read.parquet(path).select(*cols)
    aggs = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        aggs.append(F.max(c) if dt in ("timestamp", "string", "date") else F.sum(c))
    aggs.append(F.count(F.lit(1)))
    return df.agg(*aggs)


def _time(fn, runs: int = N_TIMED) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def scan_floor(spark, rep: str, con) -> dict:
    out: dict = {}
    li_path = f"{rep}/lineitem.parquet"
    for name, (cols, duck_aggs) in SCAN_SETS.items():
        duck_sql = f"SELECT {duck_aggs} FROM lineitem"
        _spark_scan(spark, li_path, cols).collect()  # warm
        con.sql(duck_sql).fetchall()
        s = _time(lambda: _spark_scan(spark, li_path, cols).collect())
        d = _time(lambda: con.sql(duck_sql).fetchall())
        out[name] = {"spark_s": s, "duckdb_s": d, "ratio": round(s / d, 2)}
    return out


def scan_levers(spark, rep: str) -> dict:
    cols = SCAN_SETS["q21_cols3"][0]
    li_path = f"{rep}/lineitem.parquet"
    out = {}
    for lever, confs in LEVERS.items():
        olds = {}
        for k, v in confs.items():
            olds[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        _spark_scan(spark, li_path, cols).collect()  # warm under the conf
        out[lever] = _time(lambda: _spark_scan(spark, li_path, cols).collect())
        for k, v in olds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


def _q8_bucketed(spark, rep: str, li_table: str, ord_table: str):
    """q8 on the orderkey-bucketed layout: l⋈o bucket-local, every dim
    (filtered part, supplier, customer's 2 join columns, nations,
    region) broadcast — no data-proportional exchange anywhere."""
    li = spark.table(li_table).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = spark.table(ord_table).select("o_orderkey", "o_custkey", "o_orderdate")
    part = spark.read.parquet(f"{rep}/part.parquet")
    supplier = spark.read.parquet(f"{rep}/supplier.parquet")
    customer = spark.read.parquet(f"{rep}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{rep}/nation.parquet")
    region = spark.read.parquet(f"{rep}/region.parquet")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(asia), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.when(F.col("supp_nation") == "NATION_3", vol)
            .otherwise(F.lit(0.0))
            .alias("nation_volume"),
        )
        .groupBy("o_year")
        .agg(
            F.round(F.sum("nation_volume"), 2).alias("nation_rev"),
            F.round(F.sum("volume"), 2).alias("total_rev"),
        )
        .select(
            "o_year",
            "nation_rev",
            "total_rev",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
        )
    )


def _q17_bucketed(spark, rep: str, li_pkt_table: str):
    """q17 on lineitem bucketed by l_partkey: the per-part average and
    the broadcast-back join both reuse the bucket distribution; part
    broadcasts; the p_brand rollup's exchange carries brand-count rows."""
    li = spark.table(li_pkt_table).select("l_partkey", "l_quantity")
    part = spark.read.parquet(f"{rep}/part.parquet").select("p_partkey", "p_brand")
    avgq = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_th")
    )
    return (
        li.join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_th"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def probe_scale(spark, n: int, scratch: str) -> dict:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.sources.readers import register_temp_views

    rep = f"{scratch}_{n}x"
    if not os.path.isdir(rep):
        print(f"# building {n}x replicas in {rep}", file=sys.stderr)
        build_replicas(spark, rep, n)

    li_table, ord_table = f"li_bkt_{n}x", f"ord_bkt_{n}x"
    li_pkt = f"li_pbkt_{n}x"
    bw = _ensure_bucketed(spark, rep, li_table, "lineitem", "l_orderkey")
    bw += _ensure_bucketed(spark, rep, ord_table, "orders", "o_orderkey")
    pkw = _ensure_bucketed(spark, rep, li_pkt, "lineitem", "l_partkey")

    registry = catalog_all()
    con = _duck_con(rep, plain=False)
    res: dict = {"bucket_write_s": round(bw, 3), "partkey_bucket_write_s": pkw}

    res["scan_floor"] = scan_floor(spark, rep, con)
    res["scan_levers_q21cols"] = scan_levers(spark, rep)

    register_temp_views(spark, rep)
    for q, plan_fn in (
        ("q8_market_share", lambda: _q8_bucketed(spark, rep, li_table, ord_table)),
        ("q17_small_qty_share", lambda: _q17_bucketed(spark, rep, li_pkt)),
    ):
        spec = registry[q]
        plain = lambda: spec.builder(spark, rep)  # noqa: B023
        for fn in (plain, plan_fn):
            fn().count()  # warm
        con.sql(spec.oracle).fetchall()

        def _shj(fn=plan_fn):
            # Bucket-local SHUFFLED HASH JOIN instead of SMJ: the bucketed
            # SMJ's cost is the per-task re-sort of both sides (Spark does
            # not trust multi-file bucket sort order); hashing the smaller
            # side skips the sort entirely while staying exchange-free.
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            try:
                return fn().count()
            finally:
                spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

        _shj()  # warm under the conf
        entry = {
            "plain_s": _time(lambda: plain().count()),
            "bucketed_s": _time(lambda: plan_fn().count()),
            "bucketed_shj_s": _time(_shj),
            "duckdb_s": _time(lambda: con.sql(spec.oracle).fetchall()),
            "bucketed_exchanges": _exchanges(plan_fn()),
            "plain_exchanges": _exchanges(plain()),
        }
        entry["ratio_plain"] = round(entry["plain_s"] / entry["duckdb_s"], 2)
        entry["ratio_bucketed"] = round(entry["bucketed_s"] / entry["duckdb_s"], 2)
        entry["ratio_bucketed_shj"] = round(
            entry["bucketed_shj_s"] / entry["duckdb_s"], 2
        )
        # value check: bucketed variant == catalog plan on the same data
        exp = {tuple(r) for r in plain().collect()}
        got = {tuple(r) for r in plan_fn().collect()}
        assert got == exp, f"{q} bucketed variant diverged"
        entry["rows"] = len(exp)
        res[q] = entry
        print(f"# {n}x {q}: {entry}", file=sys.stderr)
    con.close()
    return res


def main() -> None:
    from praw_etl_student_dropout_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:] if a.isdigit()] or [32]
    spark = get_spark(app_name="star_floor_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # JVM warm
    out = {"buckets": BUCKETS, "scales": {}}
    for n in scales:
        out["scales"][str(n)] = probe_scale(spark, n, "/tmp/spark_graft_scale")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
