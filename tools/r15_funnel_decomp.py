import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.functions.text import doc_fingerprint, lang_id, quality_score
from praw_etl_student_dropout_spark.operators.dedup import _spread, contamination_pairs
from tools.gen_zipf_corpus import ensure_corpus

spark = get_spark(app_name="r15_funnel_decomp")
spark.sparkContext.setLogLevel("ERROR")
sf = ensure_corpus()
docs = spark.read.parquet(f"{sf}/documents.parquet")

def noop(df): df.write.format("noop").mode("overwrite").save()
def timed(fn, runs=4):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return round(min(ts), 3)

def flags_df():
    return _spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        (lang_id(F.col("text")) == "en").alias("is_en"),
        (quality_score(F.col("text")) >= 0.71).alias("is_q"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))

def flags_win():
    f = flags_df()
    m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(Window.partitionBy("fingerprint"))
    return f.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))

def contam():
    return contamination_pairs(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        "text", "doc_id", shingle_n=3, min_shared=3,
    ).select(F.col("corpus_id").alias("doc_id")).distinct()

res = {}
for name, fn in [
    ("flags_only", lambda: noop(flags_df())),
    ("flags_plus_window", lambda: noop(flags_win())),
    ("contamination_only", lambda: noop(contam())),
]:
    res[name] = timed(fn)
    print(name, res[name], flush=True)
print(res)
