"""UDF-surface tests (U2/U5): the pandas-UDF sentiment twin agrees with
the native expression; the grouped-agg UDAF matches a hand computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.functions.text import clean_text, sentiment_score
from praw_etl_student_dropout_spark.functions.udfs import (
    HAVE_TEXTBLOB,
    grouped_weighted_mean,
    lexicon_sentiment_udf,
    sentiment_udf,
)
from praw_etl_student_dropout_spark.sources.readers import load_tables


def test_lexicon_udf_matches_native_expression(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(200)
    cleaned = docs.select("doc_id", clean_text(F.col("text")).alias("t"))
    both = cleaned.select(
        "doc_id",
        sentiment_score(F.col("t")).alias("native"),
        lexicon_sentiment_udf(F.col("t")).alias("udf"),
    )
    mismatch = both.filter(F.abs(F.col("native") - F.col("udf")) > 1e-12)
    assert mismatch.count() == 0


def test_sentiment_dispatch_without_textblob(spark):
    # container has no textblob → dispatch must fall back to the lexicon path
    assert not HAVE_TEXTBLOB
    df = spark.createDataFrame([("spark is fast and good",), ("slow bad crash",)], ["t"])
    rows = df.select(sentiment_udf(F.col("t")).alias("s")).collect()
    assert rows[0].s > 0 and rows[1].s < 0


def test_grouped_weighted_mean(spark):
    data = [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 0.0), ("b", 2.0, 5.0)]
    df = spark.createDataFrame(data, ["k", "v", "w"])
    got = {
        r.k: r.m
        for r in df.groupBy("k").agg(grouped_weighted_mean("v", "w").alias("m")).collect()
    }
    assert got["a"] == pytest.approx((1.0 * 1.0 + 3.0 * 3.0) / 4.0)
    assert got["b"] == pytest.approx((10.0 * 0.0 + 2.0 * 5.0) / 5.0)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "t string")
    rows = df.select(lexicon_sentiment_udf(F.col("t")).alias("s")).collect()
    assert all(r.s == 0.0 for r in rows)
