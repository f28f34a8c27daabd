"""Flagship query (SURVEY.md §5.2, FIXTURES.md §C).

The reference's signature analysis — clean text → sentiment bucket →
star join → pivot count (etl_pipeline.py:73-81,144-149,183) — transplanted
onto the driver fixture tables: ``documents`` plays raw posts (text to
clean/score), and orders ⋈ customer ⋈ nation ⋈ region is the star join
with nation/region as the tiny broadcast dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import clean_text, dropout_mentioned, sentiment_label, sentiment_score
from ..operators.aggregations import pivot_count
from ..operators.joins import star_join
from ..sources.readers import load_tables

SENTIMENT_BUCKETS = ["positive", "negative", "neutral"]


def enrich_documents(docs: DataFrame) -> DataFrame:
    """The reference's transform block (etl_pipeline.py:73-81) on
    ``documents``: clean → lexicon sentiment → label → regex flag."""
    cleaned = clean_text(F.col("text"))
    score = sentiment_score(cleaned)
    return docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        cleaned.alias("clean_text"),
        F.round(score, 6).alias("sentiment"),
        sentiment_label(score).alias("sentiment_label"),
        dropout_mentioned(cleaned).alias("dropout_mentioned"),
    )


def flagship_star_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join + sentiment-style pivot, the reference's heatmap query
    (etl_pipeline.py:144-149,183) at fixture scale.

    orders (fact) ⋈ customer ⋈ nation ⋈ region — customer is joined on
    its key (sort-merge/shuffled-hash under AQE; at 100 TB bucketed
    co-partitioning), nation/region broadcast. Pivot on o_orderstatus
    with an explicit value list, counts per region name.
    """
    t = load_tables(spark, sf_dir, ["orders", "customer", "nation", "region"])
    joined = (
        t["orders"]
        .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    out = pivot_count(
        joined.select(F.col("r_name"), F.col("o_orderstatus")),
        row_key="r_name",
        pivot_key="o_orderstatus",
        pivot_values=["F", "O", "P"],
    )
    # Pivot emits the raw status letters as column names; alias to stable
    # oracle-matching names.
    return out.select(
        F.col("r_name"),
        F.col("F").alias("cnt_f"),
        F.col("O").alias("cnt_o"),
        F.col("P").alias("cnt_p"),
    )


def document_sentiment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sentiment heatmap (A3, etl_pipeline.py:183) on
    documents: source × sentiment_label counts, zero-filled, explicit
    bucket list."""
    docs = enrich_documents(load_tables(spark, sf_dir, ["documents"])["documents"])
    out = pivot_count(
        docs.select("source", "sentiment_label"),
        row_key="source",
        pivot_key="sentiment_label",
        pivot_values=SENTIMENT_BUCKETS,
    )
    return out.select(
        "source",
        F.col("positive").alias("n_positive"),
        F.col("negative").alias("n_negative"),
        F.col("neutral").alias("n_neutral"),
    )
