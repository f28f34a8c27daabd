"""Round-14 probe: scale-adaptive spread (repartition-after-unsplittable-read,
guide §2.5) on the compute-heavy single-task branches.

The sf fixtures are one parquet file with ONE row group per table, so every
scan is a single task; heavy per-row compute before the first exchange runs
on one core of local[32]. Round 4 falsified a blanket repartition on the
TPC-H join shapes (extra shuffle > serial scan saved); this probe re-tests
the three shapes where the pre-exchange compute (regex/tokenize/sort-agg)
dominates: u10 tf/df tokenize, funnel flags, d2 sort-aggregate.

Each variant is value-checked against the current builder before timing
(same rows, order-insensitive). Timings: warm-up + min of 5 on count()
(bench methodology) at sf0.1.

Usage: python tools/r14_spread_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df_fn, runs=5):
    df_fn().count()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().count()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    spark = get_spark(app_name="r14_spread_probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF)
    reg = catalog_all()
    cores = spark.sparkContext.defaultParallelism

    results = {}

    # ---- u10_tfidf_topterms: shared spread exchange feeding BOTH branches
    from pyspark.sql import Window

    from praw_etl_student_dropout_spark.functions.text import clean_text, term_counts

    def u10_variant():
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
        docs = docs.repartition(cores, "doc_id")
        toks_arr = F.array_remove(F.split(clean_text(F.col("text")), r"\s+"), "")
        tf = docs.select("doc_id", F.explode(term_counts(toks_arr)).alias("p")).select(
            "doc_id",
            F.col("p.term").alias("term"),
            F.col("p.tf").cast("long").alias("tf"),
        )
        df_ = (
            docs.select(F.explode(F.array_distinct(toks_arr)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        scored = (
            tf.join(df_, "term")
            .crossJoin(F.broadcast(n))
            .select(
                "doc_id",
                "term",
                "tf",
                "df",
                F.round(
                    F.col("tf")
                    * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                    6,
                ).alias("tfidf"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
        return (
            scored.select("*", F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "term", "tf", "df", "tfidf", "rk")
        )

    cur = reg["u10_tfidf_topterms"].builder(spark, SF)
    assert canon(cur) == canon(u10_variant()), "u10 variant diverges"
    results["u10_current"] = timed(lambda: reg["u10_tfidf_topterms"].builder(spark, SF))
    results["u10_spread_shared"] = timed(u10_variant)

    # ---- llm_curation_funnel: spread before the flags project
    from praw_etl_student_dropout_spark.functions.text import (
        doc_fingerprint,
        lang_id,
        quality_score,
    )
    from praw_etl_student_dropout_spark.operators.dedup import contamination_pairs

    def funnel_variant():
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        spread = docs.select("doc_id", "text").repartition(cores, "doc_id")
        flags = spread.select(
            "doc_id",
            (lang_id(F.col("text")) == "en").alias("is_en"),
            (quality_score(F.col("text")) >= 0.71).alias("is_q"),
            doc_fingerprint(F.col("text")).alias("fingerprint"),
        ).withColumn("is_q", F.col("is_en") & F.col("is_q"))
        m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(
            Window.partitionBy("fingerprint")
        )
        flags = flags.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))
        contaminated = (
            contamination_pairs(
                docs.filter(F.col("doc_id") % 97 != 0),
                docs.filter(F.col("doc_id") % 97 == 0),
                "text",
                "doc_id",
                shingle_n=3,
                min_shared=3,
            )
            .select(F.col("corpus_id").alias("doc_id"))
            .distinct()
            .withColumn("is_cont", F.lit(True))
        )
        flags = flags.join(contaminated, "doc_id", "left").withColumn(
            "is_final",
            F.col("is_surv")
            & (F.col("doc_id") % 97 != 0)
            & F.coalesce(~F.col("is_cont"), F.lit(True)),
        )
        one = flags.agg(
            F.count(F.lit(1)).alias("c1"),
            F.count_if(F.col("is_en")).alias("c2"),
            F.count_if(F.col("is_q")).alias("c3"),
            F.count_if(F.col("is_surv")).alias("c4"),
            F.count_if(F.col("is_final")).alias("c5"),
        )
        return one.selectExpr(
            "stack(5, '1_total', c1, '2_lang_en', c2, '3_quality', c3, "
            "'4_deduped', c4, '5_decontaminated', c5) AS (stage, n_docs)"
        )

    cur = reg["llm_curation_funnel"].builder(spark, SF)
    assert canon(cur) == canon(funnel_variant()), "funnel variant diverges"
    results["funnel_current"] = timed(
        lambda: reg["llm_curation_funnel"].builder(spark, SF)
    )
    results["funnel_spread_flags"] = timed(funnel_variant)

    # ---- d2_dedup_by_key: hash-repartition by the dedup key before the agg
    from praw_etl_student_dropout_spark.operators.setops import dedup_by_key

    def d2_variant():
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        needed = li.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_returnflag",
        ).repartition(cores, "l_orderkey")
        first_lines = dedup_by_key(
            needed,
            ["l_orderkey"],
            tiebreak=[
                "l_linenumber", "l_partkey", "l_suppkey",
                "l_quantity", "l_extendedprice",
            ],
        )
        return first_lines.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )

    cur = reg["d2_dedup_by_key"].builder(spark, SF)
    assert canon(cur) == canon(d2_variant()), "d2 variant diverges"
    results["d2_current"] = timed(lambda: reg["d2_dedup_by_key"].builder(spark, SF))
    results["d2_spread_bykey"] = timed(d2_variant)

    # ---- a4_q1_pricing_summary: spread before the wide partial agg
    def a4_variant():
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        spec = reg["a4_q1_pricing_summary"]
        # rebuild by hand: filter + groupBy on spread input
        df = (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .select(
                "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax",
            )
            .repartition(cores, "l_returnflag", "l_linestatus")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                    ),
                    2,
                ).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
        return df

    results["a4_current"] = timed(
        lambda: reg["a4_q1_pricing_summary"].builder(spark, SF)
    )

    print({k: v for k, v in sorted(results.items())})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
