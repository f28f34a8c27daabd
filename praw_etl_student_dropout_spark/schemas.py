"""Explicit schemas (SURVEY.md §1.3: no inference in the engine core).

Two groups:
- fixture tables the driver generated (FIXTURES.md §B) — TPC-H-ish star
  schema plus ``events``/``documents``/``embeddings``;
- reference-shaped schemas (FIXTURES.md §A) reconstructed from the
  reference source: ``raw_posts`` (etl_pipeline.py:51-57), enriched posts
  (etl_pipeline.py:77-81), and the MySQL star schema
  (etl_pipeline.py:94-126) — used by the ``plans.reference_pipeline``
  re-expression and its tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver fixture tables (FIXTURES.md §B)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string, e.g. {"k": 87}
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference-shaped schemas (FIXTURES.md §A; etl_pipeline.py:51-57,77-81,94-126)
# --------------------------------------------------------------------------

RAW_POSTS = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("content", T.StringType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("url", T.StringType()),
        T.StructField("subreddit", T.StringType()),
    ]
)

POSTS_ENRICHED = T.StructType(
    list(RAW_POSTS.fields)
    + [
        T.StructField("clean_content", T.StringType()),
        T.StructField("sentiment", T.DoubleType()),
        T.StructField("sentiment_label", T.StringType()),
        T.StructField("dropout_mentioned", T.BooleanType()),
        T.StructField("year", T.IntegerType()),
    ]
)

DIM_SUBREDDIT = T.StructType(
    [
        T.StructField("subreddit_id", T.IntegerType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
    ]
)

DIM_TIME = T.StructType(
    [
        T.StructField("time_id", T.IntegerType(), nullable=False),
        T.StructField("year", T.IntegerType(), nullable=False),
    ]
)

FACT_POST = T.StructType(
    [
        T.StructField("post_id", T.StringType(), nullable=False),
        T.StructField("content", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("sentiment", T.DoubleType()),
        T.StructField("dropout_mentioned", T.BooleanType()),
        T.StructField("subreddit_id", T.IntegerType()),
        T.StructField("time_id", T.IntegerType()),
    ]
)
