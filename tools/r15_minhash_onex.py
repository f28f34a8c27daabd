import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables
from praw_etl_student_dropout_spark.operators.dedup import (
    minhash_md5_signatures, word_shingles, _spread, broadcast_if_dim)

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_minhash_onex")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()

def minhash_variant(df, text_col, id_col, threshold, num_hashes, bands,
                    shingle_n=3, max_bucket_size=None):
    rows_per_band = num_hashes // bands
    # hoist the join's implied isnotnull so every banded consumer shares
    # ONE canonical subtree (doc_id is the corpus primary key: the filter
    # drops nothing by contract)
    src = df.filter(F.col(id_col).isNotNull())
    sigs = minhash_md5_signatures(src, text_col, id_col, num_hashes, shingle_n)
    band_keys = F.array(*[
        F.array_join(
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).cast("array<string>"),
            " ")
        for b in range(bands)])
    banded = sigs.select(F.col(id_col), F.posexplode(band_keys).alias("band", "band_key"))
    # ONE exchange by the bucket key; census, anti-join and both
    # self-join sides all ride it (AQE stage reuse)
    par = spark.sparkContext.defaultParallelism
    banded = banded.repartition(par, "band", "band_key")
    if max_bucket_size is not None:
        hot = (banded.groupBy("band", "band_key")
               .agg(F.count(F.lit(1)).alias("bucket_size"))
               .filter(F.col("bucket_size") > max_bucket_size)
               .select("band", "band_key"))
        banded = banded.join(broadcast_if_dim(hot, bounded=False, why="probe"),
                             ["band", "band_key"], "left_anti")
    left, right = banded.alias("l"), banded.alias("r")
    cands = (left.join(right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct())
    shingle_sets = _spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("sh"))
    return (cands
        .join(shingle_sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(shingle_sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))

docs = spark.read.parquet(f"{SF}/documents.parquet")
mk_cur = lambda: reg["d3_minhash_pairs_capped"].builder(spark, SF)
mk_var = lambda: minhash_variant(docs, "text", "doc_id", 0.2, 16, 8, max_bucket_size=2)

cur = sorted(map(tuple, mk_cur().collect()))
var = sorted(map(tuple, mk_var().collect()))
print("values_identical:", cur == var, "n_pairs:", len(cur), flush=True)

for rnd in range(3):
    out = []
    for label, mk in [("cur", mk_cur), ("onex", mk_var)]:
        best = min(
            (lambda t0: (mk().count(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(5))
        out.append(f"{label}={best:.3f}s")
    print(f"round{rnd}: " + " ".join(out), flush=True)
