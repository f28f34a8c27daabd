"""q3 on the bucketed-by-orderkey warehouse layout (round-9; extends the
round-7 q21 probe to the next weak-but-adjudicated star query).

q3's data-proportional costs are (a) the customer⋈orders join — the
BUILDING-segment customer side is ~1/5 of a dimension-sized table, so
Catalyst broadcasts it and no shuffle exists there — and (b) the
orders⋈lineitem join plus the (orderkey, date, priority) rollup, BOTH
keyed on orderkey. On the SAME bucketed lineitem/orders tables the q21
and d2 probes use, (b) reuses the bucket distribution end to end: the
only exchange left is the 10-row TakeOrdered singlePartition gather.

Usage: python tools/q3_bucketed_probe.py [N ...]   (default: 32)
Prints one JSON line per the q21 probe's format.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.q21_bucketed_probe import BUCKETS, _ensure_bucketed, _exchanges
from tools.scale_probe import _duck_con, build_replicas

N_TIMED = 3


def _q3_plan(spark, cust, orders, lineitem):
    joined = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "order_date", "o_orderpriority")
    )


def probe_scale(spark, n: int, scratch: str) -> dict:
    rep = f"{scratch}_{n}x"
    if not os.path.isdir(rep):
        print(f"# building {n}x replicas in {rep}", file=sys.stderr)
        build_replicas(spark, rep, n)

    li_table, ord_table = f"li_bkt_{n}x", f"ord_bkt_{n}x"
    bucket_write_s = _ensure_bucketed(spark, rep, li_table, "lineitem", "l_orderkey")
    bucket_write_s += _ensure_bucketed(spark, rep, ord_table, "orders", "o_orderkey")

    from praw_etl_student_dropout_spark.plans import catalog_all

    oracle = catalog_all()["q3_shipping_priority"].oracle
    con = _duck_con(rep, plain=False)

    cust = spark.read.parquet(f"{rep}/customer.parquet")
    li_cols = ["l_orderkey", "l_extendedprice", "l_discount"]
    ord_cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    variants = {
        "plain": lambda: _q3_plan(
            spark,
            cust,
            spark.read.parquet(f"{rep}/orders.parquet").select(*ord_cols),
            spark.read.parquet(f"{rep}/lineitem.parquet").select(*li_cols),
        ),
        "bucketed": lambda: _q3_plan(
            spark,
            cust,
            spark.table(ord_table).select(*ord_cols),
            spark.table(li_table).select(*li_cols),
        ),
    }
    for v in variants.values():
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

    expect = {tuple(r) for r in variants["plain"]().collect()}
    for k, v in variants.items():
        assert {tuple(r) for r in v().collect()} == expect, f"{k} diverged"

    res: dict = {f"{k}_s": round(min(ts), 3) for k, ts in times.items()}
    res["duckdb_s"] = round(min(duck_s), 3)
    res["bucket_write_s"] = round(bucket_write_s, 3)
    res["bucketed_exchanges"] = _exchanges(variants["bucketed"]())
    res["plain_exchanges"] = _exchanges(variants["plain"]())
    res["rows"] = len(expect)
    for k in variants:
        res[f"ratio_{k}"] = round(res[f"{k}_s"] / res["duckdb_s"], 2)
    print(f"# {n}x: {res}", file=sys.stderr)
    return res


def main() -> None:
    from praw_etl_student_dropout_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:] if a.isdigit()] or [32]
    spark = get_spark(app_name="q3_bucketed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"buckets": BUCKETS, "scales": {}}
    for n in scales:
        out["scales"][str(n)] = probe_scale(spark, n, "/tmp/spark_graft_scale")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
