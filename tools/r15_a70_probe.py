import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_a70_probe")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()

def variant():
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.floor(F.col("l_quantity")).cast("long").alias("w"),
    ).repartition(32, "v")   # shared exchange: both branches reuse the scan
    buckets = rows.groupBy((F.col("v") / 10000).cast("long").alias("b")).agg(
        F.sum("w").cast("long").alias("wb"))
    bw = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cumb = buckets.select("b", "wb", F.sum("wb").over(bw).cast("long").alias("cum_b"))
    tot = buckets.agg(F.sum("wb").cast("long").alias("total"))
    qs = spark.range(1).select(F.explode(F.array(*[F.lit(q) for q in (25,50,75,90,99)])).alias("q"))
    targets = (cumb.crossJoin(F.broadcast(tot)).join(F.broadcast(qs))
        .filter(F.col("cum_b")*100 >= F.col("q")*F.col("total"))
        .groupBy("q","total")
        .agg(F.min_by(F.col("b"), F.col("b")).alias("b"),
             F.min_by(F.col("cum_b")-F.col("wb"), F.col("b")).alias("offset_b")))
    sel = rows.join(F.broadcast(targets), (F.col("v")/10000).cast("long")==F.col("b"))
    vw = Window.partitionBy("q").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    hit = sel.withColumn("cumw", (F.col("offset_b")+F.sum("w").over(vw)).cast("long")
        ).filter(F.col("cumw")*100 >= F.col("q")*F.col("total"))
    return hit.groupBy("q").agg(F.min("v").cast("long").alias("value_cents"))

cur = sorted(tuple(r) for r in reg["a70_weighted_quantiles"].builder(spark, SF).collect())
var = sorted(tuple(r) for r in variant().collect())
assert cur == var, (cur, var)
print("values OK", flush=True)
def timed(fn, runs=5):
    fn()
    ts=[]
    for _ in range(runs):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return round(min(ts),3)
res={}
for _ in range(2):
    for n, f in (("a70_current", lambda: reg["a70_weighted_quantiles"].builder(spark, SF).count()),
                 ("a70_shared_exchange", lambda: variant().count())):
        t=timed(f); res[n]=min(res.get(n,99),t); print(n,t,flush=True)
print(res)
