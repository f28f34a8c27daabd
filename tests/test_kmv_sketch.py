"""Deterministic sampling sketches: Efraimidis–Spirakis weighted
without-replacement sampling (sampling.sample_weighted_k) and the KMV
bottom-k-hash uniform sample (sketches.kmv_sample / kmv_quantiles).

Both are pure functions of (id, seed) — the tests pin the three
properties that make them sketches rather than sample jobs:
mergeability (shard top-k's recombine to the global answer),
layout-independence (repartition changes nothing), and the statistical
contract (weight-proportional enrichment / O(1/√k) rank error).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators.sampling import sample_weighted_k
from praw_etl_student_dropout_spark.operators.sketches import (
    kmv_quantiles,
    kmv_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_es_weighted_merge_and_layout_independence(docs):
    base = docs.select("doc_id", "n_chars")
    full = sample_weighted_k(base, "doc_id", "n_chars", k=50, seed=3)
    # mergeable: per-shard top-k, union, re-top-k == global top-k
    shard_a = base.filter(F.col("doc_id") % 2 == 0)
    shard_b = base.filter(F.col("doc_id") % 2 == 1)
    merged = sample_weighted_k(
        sample_weighted_k(shard_a, "doc_id", "n_chars", k=50, seed=3)
        .drop("es_key")
        .unionByName(
            sample_weighted_k(shard_b, "doc_id", "n_chars", k=50, seed=3).drop(
                "es_key"
            )
        ),
        "doc_id",
        "n_chars",
        k=50,
        seed=3,
    )
    assert _ids(full) == _ids(merged)
    # layout-independent: any physical layout yields the identical sample
    assert _ids(full) == _ids(
        sample_weighted_k(base.repartition(13), "doc_id", "n_chars", k=50, seed=3)
    )


def test_es_weight_proportional_enrichment(docs):
    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    samp_mean = (
        sample_weighted_k(docs, "doc_id", "n_chars", k=100, seed=5)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    # inclusion ∝ length ⇒ the sample is length-biased upward
    assert samp_mean > pop_mean * 1.1, (samp_mean, pop_mean)


def test_es_excludes_nonpositive_weights(spark):
    rows = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        "id long, w double",
    )
    got = sorted(r.id for r in sample_weighted_k(rows, "id", "w", k=5).collect())
    assert got == [1, 5]


def test_kmv_merge_and_determinism(docs):
    base = docs.select("doc_id", "n_chars")
    full = kmv_sample(base, "doc_id", k=64, seed=9)
    shard_a = base.filter(F.col("doc_id") % 3 == 0)
    shard_b = base.filter(F.col("doc_id") % 3 != 0)
    merged = kmv_sample(
        kmv_sample(shard_a, "doc_id", k=64, seed=9)
        .drop("kmv_coin")
        .unionByName(kmv_sample(shard_b, "doc_id", k=64, seed=9).drop("kmv_coin")),
        "doc_id",
        k=64,
        seed=9,
    )
    assert _ids(full) == _ids(merged)
    assert _ids(full) == _ids(kmv_sample(base.repartition(7), "doc_id", k=64, seed=9))


def test_kmv_quantile_rank_error(spark):
    """q50 estimated from a k=256 sketch must sit near rank 0.5 of the
    population: |rank - 0.5| <~ 3/√k ≈ 0.19; assert 0.2 with margin.
    Uses the 52k-doc Zipf corpus for statistical power."""
    from tools.gen_zipf_corpus import ensure_corpus

    zdocs = spark.read.parquet(f"{ensure_corpus()}/documents.parquet")
    sk = kmv_sample(zdocs.select("doc_id", "n_chars"), "doc_id", k=256, seed=11)
    est = kmv_quantiles(sk, "n_chars", [0.5]).first()
    assert est.sketch_rows == 256
    q50 = est.q50
    n = zdocs.count()
    rank = zdocs.filter(F.col("n_chars") <= q50).count() / n
    assert abs(rank - 0.5) < 0.2, (q50, rank)


def test_kmv_setops_estimates_within_bottomk_error(spark, sf_dir):
    """kmv_setops' union/intersection/Jaccard estimates land within the
    standard bottom-k error envelope of the exact answers, and the
    per-side estimates agree with exact distinct counts when the set
    fits inside the sketch (cnt < k => exact by construction)."""
    from pyspark.sql import functions as F

    from praw_etl_student_dropout_spark.operators.sketches import kmv_setops
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    sf_dir = "/root/testdata/sf0.01"
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_orderpriority") == "5-LOW")
    est = kmv_setops(a, b, "o_custkey", k=256).collect()[0]

    ids_a = {r[0] for r in a.select("o_custkey").distinct().collect()}
    ids_b = {r[0] for r in b.select("o_custkey").distinct().collect()}
    exact_u = len(ids_a | ids_b)
    exact_i = len(ids_a & ids_b)

    # k=256 -> sigma ~ 1/sqrt(k-1) ~ 6.3%; pin 3 sigma with margin.
    assert abs(est["est_distinct_a"] - len(ids_a)) / len(ids_a) < 0.25
    assert abs(est["est_distinct_b"] - len(ids_b)) / len(ids_b) < 0.25
    assert abs(est["est_union"] - exact_u) / exact_u < 0.25
    # Intersection compounds the Jaccard sample and the union estimate.
    assert abs(est["est_intersection"] - exact_i) / max(exact_i, 1) < 0.40
    assert 0.0 <= est["jaccard_est"] <= 1.0
