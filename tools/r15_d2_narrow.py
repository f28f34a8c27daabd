import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_d2_narrow")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()
li = spark.read.parquet(f"{SF}/lineitem.parquet")

def variant():
    # TPC-H contracts: l_linenumber in 1..7 (int-safe at any SF),
    # l_quantity integer-valued 1..50 (int-safe; sums exact either way)
    needed = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("ln"),
        "l_partkey", "l_suppkey",
        F.col("l_quantity").cast("int").alias("qty"),
        "l_extendedprice", "l_returnflag",
    )
    ordered = F.struct("ln", "l_partkey", "l_suppkey", "qty",
                       "l_extendedprice", "l_returnflag")
    dd = needed.groupBy("l_orderkey").agg(F.min(ordered).alias("__row"))
    return dd.groupBy(F.col("__row.l_returnflag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("__row.qty").cast("double")), 2).alias("sum_qty"),
    )

cur = sorted(tuple(r) for r in reg["d2_dedup_by_key"].builder(spark, SF).collect())
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
for _ in range(3):
    for n, f in (("d2_current", lambda: reg["d2_dedup_by_key"].builder(spark, SF).count()),
                 ("d2_narrowed", lambda: variant().count())):
        t=timed(f); res[n]=min(res.get(n,99),t); print(n,t,flush=True)
print(res)
