import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.sources.readers import load_tables
from praw_etl_student_dropout_spark.operators.dedup import (
    minhash_md5_signatures, word_shingles, _spread, broadcast_if_dim,
    minhash_md5_pairs)

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_minhash_decomp")
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
docs = spark.read.parquet(f"{SF}/documents.parquet")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def timed(label, mk, n=5):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); noop(mk()); best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {best:.3f}s", flush=True)

# stage isolations
timed("scan_only", lambda: docs.select("doc_id", "text"))
timed("shingles_only", lambda: _spread(docs.select("doc_id","text"), "doc_id")
      .select("doc_id", word_shingles(F.col("text"), 3).alias("sh")))
timed("signatures", lambda: minhash_md5_signatures(docs, "text", "doc_id", 16, 3))
def banded():
    rows_per_band = 2
    sigs = minhash_md5_signatures(docs.filter(F.col("doc_id").isNotNull()), "text", "doc_id", 16, 3)
    band_keys = F.array(*[
        F.array_join(F.slice(F.col("sig"), b*2+1, 2).cast("array<string>"), " ")
        for b in range(8)])
    return sigs.select(F.col("doc_id"), F.posexplode(band_keys).alias("band","band_key"))
timed("banded", banded)
timed("full_pipeline", lambda: minhash_md5_pairs(docs, "text", "doc_id",
      threshold=0.2, num_hashes=16, bands=8, max_bucket_size=2))
