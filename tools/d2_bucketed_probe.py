"""d2_dedup_by_key on a bucketed-by-orderkey layout (round-8 VERDICT #2).

d2 is the one headline query left outside the 2x gate whose cost was
not yet proven per-core-bound: 2.28x DuckDB at 32x and falling
(SCALE_r07). Its only data-proportional cost is the ONE hash exchange
that co-locates each l_orderkey's lines for the survivor pick. The
warehouse answer — same lever as q21 (tools/q21_bucketed_probe.py) —
is to pay that shuffle once at LOAD: with lineitem written bucketed
(and sorted) by l_orderkey, the bucketed scan already satisfies the
groupBy(l_orderkey) distribution, so the dedup aggregates in place and
the only remaining exchange is the 3-group returnflag rollup of
already-collapsed rows.

The probe times, interleaved in one session against DuckDB on the same
replica data (scale_probe --paired protocol): d2 on the PLAIN replica
layout, d2 on the BUCKETED layout, and the DuckDB oracle; asserts the
bucketed plan's big exchange is gone (<= 1 shuffle exchange vs 2); and
extends the plain-layout convergence series past 32x (VERDICT r7 #2:
confirm the falling ratio is floor amortization, not a plan problem).

Usage: python tools/d2_bucketed_probe.py [N ...]   (default: 32 64)
Prints one JSON line per run:
{"scales": {N: {plain_s, bucketed_s, duckdb_s, ratio_plain,
ratio_bucketed, plain_exchanges, bucketed_exchanges, bucket_write_s}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.q21_bucketed_probe import _ensure_bucketed, _exchanges
from tools.scale_probe import _duck_con, build_replicas

N_TIMED = 3


def _d2(spark, sf_dir: str | None, li_table: str | None):
    """The d2 headline plan (plans/catalog.py::d2_dedup_by_key) over
    either a plain parquet dir or a bucketed catalog table."""
    from praw_etl_student_dropout_spark.operators.setops import dedup_by_key

    li = (
        spark.table(li_table)
        if li_table
        else spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    needed = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag",
    )
    first_lines = dedup_by_key(
        needed,
        ["l_orderkey"],
        tiebreak=["l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice"],
    )
    return first_lines.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def probe_scale(spark, n: int, scratch: str) -> dict:
    rep = f"{scratch}_{n}x"
    if not os.path.isdir(rep):
        print(f"# building {n}x replicas in {rep}", file=sys.stderr)
        build_replicas(spark, rep, n)

    li_table = f"li_bkt_{n}x"  # same layout q21's probe uses
    bucket_write_s = _ensure_bucketed(spark, rep, li_table, "lineitem", "l_orderkey")

    from praw_etl_student_dropout_spark.plans import catalog_all

    oracle = catalog_all()["d2_dedup_by_key"].oracle
    con = _duck_con(rep, plain=False)

    variants = {
        "plain": lambda: _d2(spark, rep, None),
        "bucketed": lambda: _d2(spark, None, li_table),
    }
    exch = {k: _exchanges(v()) for k, v in variants.items()}
    for v in variants.values():  # warm-ups
        v().count()
    con.sql(oracle).fetchall()

    times: dict[str, list[float]] = {k: [] for k in variants}
    duck: list[float] = []
    for _ in range(N_TIMED):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().count()
            times[k].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.sql(oracle).fetchall()
        duck.append(time.perf_counter() - t0)
    con.close()
    plain_s = round(min(times["plain"]), 3)
    bucketed_s = round(min(times["bucketed"]), 3)
    duckdb_s = round(min(duck), 3)
    out = {
        "plain_s": plain_s,
        "bucketed_s": bucketed_s,
        "duckdb_s": duckdb_s,
        "ratio_plain": round(plain_s / duckdb_s, 2),
        "ratio_bucketed": round(bucketed_s / duckdb_s, 2),
        "plain_exchanges": exch["plain"],
        "bucketed_exchanges": exch["bucketed"],
        "bucket_write_s": bucket_write_s,
    }
    print(f"# {n}x: {out}", file=sys.stderr)
    return out


def main() -> None:
    from praw_etl_student_dropout_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:]] or [32, 64]
    spark = get_spark(app_name="d2_bucketed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"scales": {str(n): probe_scale(spark, n, "/tmp/spark_graft_scale") for n in scales}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
