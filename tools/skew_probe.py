"""Skew-stress probe: salted vs unsalted join on a deliberately Zipfian
key at 32x (round-7 VERDICT #7).

Materializes a skewed replica of the 32x lineitem (two thirds of rows
remapped onto ONE hot supplier key — the crawl-data shape where a single
boilerplate key dominates), then times four execution strategies of the
SAME join+aggregate, interleaved, with result equality asserted:

  plain        shuffle join, broadcast + AQE skew mitigation disabled —
               the naive plan whose hot key serializes one reducer
  aqe_skew     Spark's built-in AQE skew-join split (detects oversized
               partitions at runtime and splits them)
  salted       operators/joins.salted_join — 16-way deterministic salt
               on the fact side, supplier replicated per salt
  broadcast    plain broadcast-hash join (the lower bound when the dim
               side fits; salting exists for when it doesn't)

DuckDB runs the same query on the same parquet as the cross-engine
reference. Usage: python tools/skew_probe.py [n_replica]  (default 32;
replicas are built by tools/scale_probe.py conventions if missing).
Prints one JSON line; BASELINE.md §round-7-skew records the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_probe import build_replicas

N_TIMED = 3
SALTS = 16


def _ensure_skewed(spark, rep: str, skew_dir: str) -> None:
    if os.path.isdir(f"{skew_dir}/lineitem_skewed.parquet"):
        return
    os.makedirs(skew_dir, exist_ok=True)
    li = spark.read.parquet(f"{rep}/lineitem.parquet")
    hot = (
        spark.read.parquet(f"{rep}/supplier.parquet")
        .agg(F.min("s_suppkey"))
        .first()[0]
    )
    skewed = li.select(
        F.when(F.col("l_orderkey") % 3 != 0, F.lit(hot))
        .otherwise(F.col("l_suppkey"))
        .alias("hot_suppkey"),
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
    )
    skewed.repartition(32).write.mode("overwrite").parquet(
        f"{skew_dir}/lineitem_skewed.parquet"
    )


def _agg(joined):
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def main() -> None:
    from praw_etl_student_dropout_spark.operators.joins import salted_join
    from praw_etl_student_dropout_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rep = f"/tmp/spark_graft_scale_{n}x"
    skew_dir = f"/tmp/spark_graft_skew_{n}x"
    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(rep):
        print(f"# building {n}x replicas in {rep}", file=sys.stderr)
        build_replicas(spark, rep, n)
    _ensure_skewed(spark, rep, skew_dir)

    fact = lambda: spark.read.parquet(f"{skew_dir}/lineitem_skewed.parquet")  # noqa: E731
    sup = lambda: spark.read.parquet(f"{rep}/supplier.parquet").select(  # noqa: E731
        F.col("s_suppkey").alias("hot_suppkey"), "s_name"
    )

    def set_conf(broadcast: bool, skew: bool) -> None:
        v = "10485760" if broadcast else "-1"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "true" if skew else "false"
        )

    def run(variant: str):
        if variant == "plain":
            set_conf(False, False)
            df = _agg(fact().join(sup(), "hot_suppkey"))
        elif variant == "aqe_skew":
            set_conf(False, True)
            df = _agg(fact().join(sup(), "hot_suppkey"))
        elif variant == "salted":
            set_conf(False, False)
            df = _agg(
                salted_join(
                    fact(), sup(), ["hot_suppkey"], SALTS, salt_on="l_orderkey"
                )
            )
        else:  # broadcast
            set_conf(True, False)
            df = _agg(fact().join(F.broadcast(sup()), "hot_suppkey"))
        return df

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW fact AS SELECT * FROM "
        f"'{skew_dir}/lineitem_skewed.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM '{rep}/supplier.parquet/*.parquet'"
    )
    duck_sql = """
      SELECT s_name, CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM fact JOIN supplier ON s_suppkey = hot_suppkey
      GROUP BY s_name
    """

    variants = ["plain", "aqe_skew", "salted", "broadcast"]
    for v in variants:  # warm-ups
        run(v).count()
    con.sql(duck_sql).fetchall()

    times: dict[str, list[float]] = {v: [] for v in variants}
    duck: list[float] = []
    for _ in range(N_TIMED):
        for v in variants:
            t0 = time.perf_counter()
            run(v).count()
            times[v].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.sql(duck_sql).fetchall()
        duck.append(time.perf_counter() - t0)
    con.close()

    # Counts must match exactly; the 12.8M-row hot key's double sum is
    # order-dependent across plan shapes, so revenue gets a relative
    # tolerance (the CATALOG entry j11_salted_skew_join runs at fixture
    # scale where the rounded sums are bit-equal and oracle-checked).
    def snap(v):
        return {r["s_name"]: (r["n_rows"], r["revenue"]) for r in run(v).collect()}

    expect = snap("broadcast")
    for v in variants:
        got = snap(v)
        assert got.keys() == expect.keys(), f"{v} diverged on keys"
        for k in expect:
            assert got[k][0] == expect[k][0], f"{v} diverged on count({k})"
            assert abs(got[k][1] - expect[k][1]) <= 1e-6 * max(
                1.0, abs(expect[k][1])
            ), f"{v} diverged on revenue({k})"
    set_conf(True, True)  # restore defaults

    out = {
        "n": n,
        "hot_fraction": 2 / 3,
        "salts": SALTS,
        "rows": len(expect),
        "duckdb_s": round(min(duck), 3),
        **{f"{v}_s": round(min(times[v]), 3) for v in variants},
    }
    out["salted_vs_plain"] = round(out["plain_s"] / out["salted_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
