import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from praw_etl_student_dropout_spark.session import get_spark
import praw_etl_student_dropout_spark.operators.dedup as dedup
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_spread_unpin")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()
cores = spark.sparkContext.defaultParallelism
orig_spread = dedup._spread

def unpinned_spread(df, id_col):
    try:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        n_parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_parts < parallelism:
        return df.repartition(id_col)   # REPARTITION_BY_COL: AQE may coalesce
    return df

def timed(fn, runs=5):
    fn()
    ts=[]
    for _ in range(runs):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return round(min(ts),3)

names = ["u10_tfidf_topterms", "d3_exact_dedup", "llm_curation_funnel"]
res = {}
for _ in range(2):
    for arm, sp in (("pinned", orig_spread), ("unpinned", unpinned_spread)):
        dedup._spread = sp
        for n in names:
            t = timed(lambda n=n: reg[n].builder(spark, SF).count())
            key = f"{n}.{arm}"
            res[key] = min(res.get(key, 99), t)
            print(cores, key, t, flush=True)
dedup._spread = orig_spread
print({k: v for k, v in sorted(res.items())})
