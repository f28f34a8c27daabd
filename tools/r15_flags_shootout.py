import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.functions.text import lang_id, quality_score, doc_fingerprint
from tools.r15_text_probe import lang_id_v1, quality_score_v2
from tools.gen_zipf_corpus import ensure_corpus

spark = get_spark(app_name="r15_flags_shootout")
spark.sparkContext.setLogLevel("ERROR")
sf = ensure_corpus()
docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id","text").repartition(32, "doc_id")

def noop(df): df.write.format("noop").mode("overwrite").save()
def timed(fn, runs=4):
    fn()
    ts=[]
    for _ in range(runs):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return round(min(ts),3)

def f0():
    return docs.select(
        "doc_id",
        (lang_id(F.col("text")) == "en").alias("is_en"),
        (quality_score(F.col("text")) >= 0.71).alias("is_q"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))

def f1():
    return docs.select(
        "doc_id",
        (lang_id_v1(F.col("text")) == "en").alias("is_en"),
        (quality_score_v2(F.col("text")) >= 0.71).alias("is_q"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))

def bound(lang_fn, q_fn, gated):
    s = F.struct(
        (lang_fn(F.col("text")) == "en").alias("en"),
        (q_fn(F.col("text")) >= 0.71).alias("q"),
    )
    def mk(b):
        is_q = b["en"] & b["q"]
        fp = doc_fingerprint(F.col("text"))
        if gated:
            fp = F.when(is_q, fp).otherwise(F.concat(F.lit("_"), F.col("doc_id")))
        return F.struct(b["en"].alias("is_en"), is_q.alias("is_q"), fp.alias("fingerprint"))
    return docs.select("doc_id", F.transform(F.array(s), mk)[0].alias("f"))

def f3():   # bound struct, current fns, ungated — fields extracted immediately
    b = bound(lang_id, quality_score, False)
    return b.select("doc_id", "f.is_en", "f.is_q", "f.fingerprint")

def f4():   # bound struct, v1/v2 fns, gated fp, extract immediately
    b = bound(lang_id_v1, quality_score_v2, True)
    return b.select("doc_id", "f.is_en", "f.is_q", "f.fingerprint")

def win(flags):
    m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(Window.partitionBy("fingerprint"))
    return flags.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))

def f4w():  # bound struct kept through the window exchange, extract above
    b = bound(lang_id_v1, quality_score_v2, True)
    m = F.min(F.when(F.col("f.is_q"), F.col("doc_id"))).over(Window.partitionBy("f.fingerprint"))
    return b.withColumn("is_surv", F.col("f.is_q") & (F.col("doc_id") == m)).select(
        "doc_id", F.col("f.is_en").alias("is_en"), F.col("f.is_q").alias("is_q"),
        F.col("f.fingerprint").alias("fingerprint"), "is_surv")

variants = {
  "f0_current": lambda: noop(f0()),
  "f1_v1v2": lambda: noop(f1()),
  "f3_bound": lambda: noop(f3()),
  "f4_bound_v1v2_gated": lambda: noop(f4()),
  "f0_window": lambda: noop(win(f0())),
  "f4w_window_bound": lambda: noop(f4w()),
}
for n, fn in variants.items(): fn()
res={}
for _ in range(2):
    for n, fn in variants.items():
        t=timed(fn); res[n]=min(res.get(n,99),t); print(n,t,flush=True)
print(res)
