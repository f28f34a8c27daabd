"""The WHOLE reference pipeline in its actual operating mode — incremental.

The reference never ran once: it re-ran on a cadence (11 timestamped
backup CSVs over 14 days, `.MISSING_LARGE_BLOBS:1-11`), relying on
MySQL INSERT IGNORE for dim stability (etl_pipeline.py:97,106) and
fact idempotence (:122). `plans/reference_pipeline.py` is the one-shot
batch form; this module is the cadence form as a CHECKPOINTED STREAM:
each micro-batch of raw posts runs transform → dim UPSERT (existing
surrogate keys preserved, new natural keys appended after max — the
exact INSERT IGNORE + SELECT-back semantics) → broadcast key-swap fact
build → anti-join idempotent fact append.

Replay safety follows the repo's versioned-state convention
(stream_jobs._state_version_below): foreachBatch is at-least-once, so
- dims persist as ``dim_*/v{batch_id}``; a batch loads the newest
  version STRICTLY below its id (a crashed attempt's own write is
  invisible to its replay),
- fact rows land in a ``batch_id={N}`` partition REWRITTEN whole per
  batch (replay overwrites itself, never duplicates), with the
  anti-join screening only against PRIOR batches' partitions.

Final-state contract (pinned in tests/test_streaming.py): the star
read-back after the stream drains is VALUE-EQUAL to the one-shot batch
pipeline over the same posts — surrogate ids may differ (arrival-order
vs global dense_rank) but the read-back resolves surrogates to natural
values, which is what the reference's charts consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.etl import build_fact, upsert_dim
from ..plans.reference_pipeline import transform
from .stream_jobs import _state_version_below

RAW_POSTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("content", T.StringType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("url", T.StringType()),
        T.StructField("subreddit", T.StringType()),
    ]
)

_FACT_COLS = [
    "id", "content", "url", "sentiment", "sentiment_label",
    "dropout_mentioned", "subreddit_id", "time_id",
]


def _load_dim(
    spark: SparkSession, path: str, batch_id: int, natural_key: str,
    surrogate: str, key_type: str,
) -> DataFrame:
    v = _state_version_below(path, batch_id)
    if v is None:
        return spark.createDataFrame(
            [], f"{surrogate} int, {natural_key} {key_type}"
        )
    return spark.read.parquet(f"{path}/v{v}")


def _reference_merge_one_batch(
    batch_df: DataFrame, batch_id: int, warehouse_dir: str
) -> None:
    """One micro-batch of the incremental reference pipeline;
    module-level for direct replay testing."""
    spark = batch_df.sparkSession
    enriched = transform(batch_df.dropDuplicates(["id"]))

    sub_path = f"{warehouse_dir}/dim_subreddit"
    time_path = f"{warehouse_dir}/dim_time"
    dim_sub = upsert_dim(
        _load_dim(spark, sub_path, batch_id, "name", "subreddit_id", "string"),
        enriched.select(F.col("subreddit").alias("name")),
        "name",
        "subreddit_id",
    )
    dim_time = upsert_dim(
        _load_dim(spark, time_path, batch_id, "year", "time_id", "int"),
        enriched.select("year"),
        "year",
        "time_id",
    )
    dim_sub.write.mode("overwrite").parquet(f"{sub_path}/v{batch_id}")
    dim_time.write.mode("overwrite").parquet(f"{time_path}/v{batch_id}")

    fact = build_fact(
        enriched,
        [
            (dim_sub, "subreddit", "name", "subreddit_id"),
            (dim_time, "year", "year", "time_id"),
        ],
        _FACT_COLS,
    )
    fact_path = f"{warehouse_dir}/fact_post"
    try:
        prior = spark.read.parquet(fact_path).filter(
            F.col("batch_id") < batch_id
        )
        fact = fact.join(prior.select("id"), "id", "left_anti")
    except Exception:
        pass  # first batch: no fact table yet
    # replay-idempotent: the batch's whole partition is rewritten
    fact.write.mode("overwrite").parquet(f"{fact_path}/batch_id={batch_id}")


def incremental_reference_stream(
    spark: SparkSession,
    posts_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available raw-post files through the incremental pipeline
    (availableNow trigger — the reference's 'run the script again'
    cadence, checkpointed)."""
    stream = spark.readStream.schema(RAW_POSTS).parquet(posts_dir)

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        _reference_merge_one_batch(batch_df, batch_id, warehouse_dir)

    q = (
        stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def query_star_incremental(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """Star read-back over the incremental warehouse: newest dim
    versions + every fact partition (the batch pipeline's query_star
    against the versioned layout)."""
    import os

    def newest(path: str) -> DataFrame:
        versions = [
            int(d[1:]) for d in os.listdir(path)
            if d.startswith("v") and d[1:].isdigit()
        ]
        return spark.read.parquet(f"{path}/v{max(versions)}")

    fact = spark.read.parquet(f"{warehouse_dir}/fact_post")
    dim_sub = newest(f"{warehouse_dir}/dim_subreddit")
    dim_time = newest(f"{warehouse_dir}/dim_time")
    return (
        fact.join(F.broadcast(dim_sub), "subreddit_id")
        .join(F.broadcast(dim_time), "time_id")
        .select(
            "id",
            "content",
            "sentiment",
            "sentiment_label",
            "dropout_mentioned",
            F.col("name").alias("subreddit"),
            "year",
        )
    )
