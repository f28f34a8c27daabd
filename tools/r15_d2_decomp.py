import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from praw_etl_student_dropout_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_d2_decomp")
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{SF}/lineitem.parquet")
needed = li.select("l_orderkey","l_linenumber","l_partkey","l_suppkey",
                   "l_quantity","l_extendedprice","l_returnflag")
def noop(df): df.write.format("noop").mode("overwrite").save()
def timed(fn, runs=5):
    fn()
    ts=[]
    for _ in range(runs):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return round(min(ts),3)

tiebreak = ["l_linenumber","l_partkey","l_suppkey","l_quantity","l_extendedprice"]
rest = ["l_linenumber","l_partkey","l_suppkey","l_quantity","l_extendedprice","l_returnflag"]

def d2_min_struct():
    ordered = F.struct(*[F.col(c) for c in rest])
    dd = (needed.groupBy("l_orderkey").agg(F.min(ordered).alias("__row"))
          .select("l_orderkey", *[F.col("__row")[c].alias(c) for c in rest]))
    return dd.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"),2).alias("sum_qty"))

def d2_min_by():
    dd = (needed.groupBy("l_orderkey").agg(
            F.min_by(F.struct(*[F.col(c) for c in rest]), F.struct(*[F.col(c) for c in tiebreak])).alias("__row"))
          .select("l_orderkey", *[F.col("__row")[c].alias(c) for c in rest]))
    return dd.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"),2).alias("sum_qty"))

def d2_window():
    w = Window.partitionBy("l_orderkey").orderBy(*tiebreak)
    dd = needed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn")==1)
    return dd.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"),2).alias("sum_qty"))

def d2_min_struct_narrow():
    # l_quantity/l_extendedprice/l_returnflag needed in output; pack only
    # what the FINAL agg needs: rf + qty. Tiebreak must stay total-order.
    ordered = F.struct(*[F.col(c) for c in rest])
    dd = (needed.groupBy("l_orderkey").agg(F.min(ordered).alias("__row"))
          .select(F.col("__row.l_returnflag").alias("l_returnflag"),
                  F.col("__row.l_quantity").alias("l_quantity")))
    return dd.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"),2).alias("sum_qty"))

variants = {
  "scan7": lambda: noop(needed),
  "scan7_spread": lambda: noop(needed.repartition(32, "l_orderkey")),
  "keycount_agg": lambda: noop(needed.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))),
  "d2_min_struct_full": lambda: noop(d2_min_struct()),
  "d2_min_by": lambda: noop(d2_min_by()),
  "d2_window": lambda: noop(d2_window()),
  "d2_min_struct_narrow": lambda: noop(d2_min_struct_narrow()),
}
for n,f in variants.items(): f()
res={}
for _ in range(2):
    for n,f in variants.items():
        t=timed(f); res[n]=min(res.get(n,99),t); print(n,t,flush=True)
print(res)
