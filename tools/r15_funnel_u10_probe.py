"""Round-15 probe: funnel gated fingerprint + u10 single-tokenize
(VERDICT r14 'Next round' #1 and #2).

- llm_curation_funnel variant: doc_fingerprint is computed ONLY for rows
  that pass the lang+quality gates (CASE WHEN evaluates just the taken
  branch); gated-out rows get a unique non-md5 placeholder ('_<doc_id>',
  disjoint from hex md5) so the fingerprint window's null-partition
  cannot become a skewed straggler and the window min over quality rows
  is untouched. Output-identical by construction (is_surv is false for
  every gated-out row either way); value-checked anyway.

- u10_tfidf_topterms variant: tokenize + term_counts run ONCE; the
  (doc_id, term_counts) table is shuffled by doc_id and BOTH the tf and
  df branches hang off that exchange (guide §8: shuffle the lightweight
  proxy once instead of re-deriving it per branch). The df branch reads
  distinct terms straight out of the tc structs; the rank window rides
  the same hash(doc_id) partitioning, so no second doc-keyed exchange.

Timings: interleaved min-of-5 on count() (bench methodology) per corpus.

Usage: python tools/r15_funnel_u10_probe.py [zipf|sf]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def timed(fn, runs=5):
    fn().count()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().count()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def funnel_variant(spark, sf):
    from praw_etl_student_dropout_spark.functions.text import (
        doc_fingerprint,
        lang_id,
        quality_score,
    )
    from praw_etl_student_dropout_spark.operators.dedup import (
        _spread,
        contamination_pairs,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    is_q = (lang_id(F.col("text")) == "en") & (quality_score(F.col("text")) >= 0.71)
    flags = _spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        (lang_id(F.col("text")) == "en").alias("is_en"),
        is_q.alias("is_q"),
        F.when(is_q, doc_fingerprint(F.col("text")))
        .otherwise(F.concat(F.lit("_"), F.col("doc_id")))
        .alias("fingerprint"),
    )
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


def u10_variant(spark, sf):
    from praw_etl_student_dropout_spark.functions.text import clean_text, term_counts

    cores = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    try:
        n_parts = docs.rdd.getNumPartitions()
    except Exception:
        n_parts = cores
    if n_parts < cores:
        docs = docs.repartition(cores)  # round-robin: parallelize the tokenize
    toks_arr = F.array_remove(F.split(clean_text(F.col("text")), r"\s+"), "")
    tc = docs.select("doc_id", term_counts(toks_arr).alias("tc")).repartition(
        F.col("doc_id")
    )
    tf = tc.select("doc_id", F.explode("tc").alias("p")).select(
        "doc_id",
        F.col("p.term").alias("term"),
        F.col("p.tf").cast("long").alias("tf"),
    )
    df_ = (
        tc.select(F.explode(F.col("tc.term")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = tc.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select("*", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


def main() -> int:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark
    from tools.gen_zipf_corpus import ensure_corpus

    which = sys.argv[1] if len(sys.argv) > 1 else "zipf"
    spark = get_spark(app_name="r15_funnel_u10_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf = (
        ensure_corpus()
        if which == "zipf"
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    reg = catalog_all()

    results = {}
    cur = reg["llm_curation_funnel"].builder(spark, sf)
    var = funnel_variant(spark, sf)
    assert canon(cur) == canon(var), "funnel variant diverges"
    print("funnel values OK", flush=True)
    cur10 = reg["u10_tfidf_topterms"].builder(spark, sf)
    var10 = u10_variant(spark, sf)
    assert canon(cur10) == canon(var10), "u10 variant diverges"
    print("u10 values OK", flush=True)

    # interleave the arms so host drift hits both equally
    for _ in range(2):
        for name, fn in (
            ("funnel_current", lambda: reg["llm_curation_funnel"].builder(spark, sf)),
            ("funnel_gated_fp", lambda: funnel_variant(spark, sf)),
            ("u10_current", lambda: reg["u10_tfidf_topterms"].builder(spark, sf)),
            ("u10_single_tokenize", lambda: u10_variant(spark, sf)),
        ):
            t = timed(fn)
            results[name] = min(results.get(name, 99.0), t)
            print(f"{name}: {t}", flush=True)
    print({k: v for k, v in sorted(results.items())})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
