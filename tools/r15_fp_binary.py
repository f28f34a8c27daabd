import json, sys, time, urllib.request
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Window
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables
from praw_etl_student_dropout_spark.functions.text import doc_fingerprint, lang_id, quality_score
from praw_etl_student_dropout_spark.operators.dedup import _spread
from praw_etl_student_dropout_spark.plans.catalog_llm import contamination_pairs

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_fp_binary", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()
sc = spark.sparkContext
ui = sc.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

def funnel_variant(spark, sf_dir, binary_fp):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = doc_fingerprint(F.col("text"))
    if binary_fp:
        fp = F.unhex(fp)
    flags = _spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        (lang_id(F.col("text")) == "en").alias("is_en"),
        (quality_score(F.col("text")) >= 0.71).alias("is_q"),
        fp.alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))
    m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(Window.partitionBy("fingerprint"))
    flags = flags.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))
    contaminated = (
        contamination_pairs(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "text", "doc_id", shingle_n=3, min_shared=3,
        ).select(F.col("corpus_id").alias("doc_id")).distinct().withColumn("is_cont", F.lit(True))
    )
    flags = flags.join(contaminated, "doc_id", "left").withColumn(
        "is_final",
        F.col("is_surv") & (F.col("doc_id") % 97 != 0) & F.coalesce(~F.col("is_cont"), F.lit(True)),
    )
    one = flags.agg(
        F.count(F.lit(1)).alias("c1"), F.count_if(F.col("is_en")).alias("c2"),
        F.count_if(F.col("is_q")).alias("c3"), F.count_if(F.col("is_surv")).alias("c4"),
        F.count_if(F.col("is_final")).alias("c5"),
    )
    return one.selectExpr(
        "stack(5, '1_total', c1, '2_lang_en', c2, '3_quality', c3, "
        "'4_deduped', c4, '5_decontaminated', c5) AS (stage, n_docs)"
    )

# value check first
cur = sorted(map(tuple, reg["llm_curation_funnel"].builder(spark, SF).collect()))
var = sorted(map(tuple, funnel_variant(spark, SF, True).collect()))
print("values_identical:", cur == var, cur, flush=True)

def run_metered(label, make):
    group = f"sb-{label}"
    sc.setJobGroup(group, label)
    t0 = time.perf_counter()
    make().count()
    dt = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    stages = set()
    for j in jobs:
        ji = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs/{j}"))
        stages.update(ji["stageIds"])
    w = rows = 0
    for s in stages:
        try:
            si = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages/{s}"))
        except Exception:
            continue
        for att in si:
            w += att.get("shuffleWriteBytes", 0)
            rows += att.get("shuffleWriteRecords", 0)
    return dt, w, rows

# interleaved timing, min of 5, 3 rounds
for rnd in range(3):
    res = {}
    for label, mk in [("hex", lambda: reg["llm_curation_funnel"].builder(spark, SF)),
                      ("bin", lambda: funnel_variant(spark, SF, True))]:
        best = None
        for i in range(5):
            dt, w, rows = run_metered(f"{label}{rnd}{i}", mk)
            best = dt if best is None else min(best, dt)
        res[label] = (best, w, rows)
    print(f"round{rnd}: hex={res['hex'][0]:.3f}s bytes={res['hex'][1]} "
          f"bin={res['bin'][0]:.3f}s bytes={res['bin'][1]}", flush=True)
