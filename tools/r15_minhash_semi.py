import sys, time, statistics
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.sources.readers import load_tables
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.operators.dedup import (
    minhash_md5_signatures, word_shingles, _spread, broadcast_if_dim)

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_minhash_semi")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()
docs = spark.read.parquet(f"{SF}/documents.parquet")

def variant(df, text_col, id_col, threshold, num_hashes, bands,
            shingle_n=3, max_bucket_size=None):
    rows_per_band = num_hashes // bands
    sigs = minhash_md5_signatures(
        df.filter(F.col(id_col).isNotNull()), text_col, id_col, num_hashes, shingle_n)
    band_keys = F.array(*[
        F.array_join(F.slice(F.col("sig"), b*rows_per_band+1, rows_per_band).cast("array<string>"), " ")
        for b in range(bands)])
    banded = sigs.select(F.col(id_col), F.posexplode(band_keys).alias("band","band_key"))
    if max_bucket_size is not None:
        hot = (banded.groupBy("band","band_key").agg(F.count(F.lit(1)).alias("bucket_size"))
               .filter(F.col("bucket_size") > max_bucket_size).select("band","band_key"))
        banded = banded.join(broadcast_if_dim(hot, bounded=False, why="probe"),
                             ["band","band_key"], "left_anti")
    left, right = banded.alias("l"), banded.alias("r")
    cands = (left.join(right,
        (F.col("l.band")==F.col("r.band")) & (F.col("l.band_key")==F.col("r.band_key"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct())
    shingle_sets = _spread(df.select(F.col(id_col), F.col(text_col)), id_col)
    # semi-prefilter: shingle only the docs that appear in a candidate pair
    sh_a = (shingle_sets
            .join(cands.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_semi")
            .select(F.col(id_col).alias("id_a"), word_shingles(F.col(text_col), shingle_n).alias("sh_a")))
    sh_b = (shingle_sets
            .join(cands.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_semi")
            .select(F.col(id_col).alias("id_b"), word_shingles(F.col(text_col), shingle_n).alias("sh_b")))
    return (cands.join(sh_a, "id_a").join(sh_b, "id_b")
        .withColumn("jaccard",
            F.size(F.array_intersect("sh_a","sh_b")) / F.size(F.array_union("sh_a","sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a","id_b", F.round("jaccard",6).alias("jaccard")))

mk_cur = lambda: reg["d3_minhash_pairs_capped"].builder(spark, SF)
mk_var = lambda: variant(docs, "text", "doc_id", 0.2, 16, 8, max_bucket_size=2)

cur = sorted(map(tuple, mk_cur().collect()))
var = sorted(map(tuple, mk_var().collect()))
print("values_identical:", cur == var, "n_pairs:", len(cur), flush=True)

def noop(df): df.write.format("noop").mode("overwrite").save()
ts = {"cur": [], "semi": []}
for i in range(12):
    for label, mk in [("cur", mk_cur), ("semi", mk_var)]:
        t0 = time.perf_counter(); noop(mk()); ts[label].append(time.perf_counter()-t0)
for k,v in ts.items():
    print(f"{k}: min={min(v):.3f} med={statistics.median(v):.3f}", flush=True)
