"""SemDeDup (Abbas et al. 2023) — cluster-bounded semantic dedup.

Recall is pinned on the Zipf corpus's planted cosine pairs (1000 pairs
at exact cosines {0.99, 0.95, 0.90, 0.80}); thresholds carry margin
below the measured sweep (k=128, nprobe=2, iters=0: recall 1.0 @ 0.99,
0.92 @ 0.95 — BASELINE.md §semdedup). False positives are impossible by
construction (every candidate is exact-cosine verified), so the FP
assertion is on the operator's own output. Survivor semantics reuse the
repo-wide min-id convention via connected components.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators.dedup import (
    semdedup_pairs,
    semdedup_survivors,
)
from tools.gen_zipf_corpus import ensure_corpus


@pytest.fixture(scope="module")
def zemb(spark):
    return spark.read.parquet(f"{ensure_corpus()}/embeddings.parquet")


@pytest.fixture(scope="module")
def small_emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_semdedup_zipf_recall_and_no_false_positives(spark, zemb):
    pairs = semdedup_pairs(
        zemb, threshold=0.94, num_clusters=128, kmeans_iters=0, nprobe=2
    ).persist()
    try:
        # exact verify ⇒ zero false positives, ever
        assert pairs.agg(F.min("cosine")).first()[0] >= 0.94
        found = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in pairs.collect()
        }
        planted = spark.read.parquet(
            f"{ensure_corpus()}/planted_vec_pairs.parquet"
        ).collect()
        by: dict[float, list[int]] = {}
        for r in planted:
            key = float(r.target_cos)
            by.setdefault(key, [0, 0])
            by[key][1] += 1
            if (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) in found:
                by[key][0] += 1
        recall = {k: v[0] / v[1] for k, v in by.items()}
        # measured 1.0 / 0.92; margin for centroid-sample sensitivity
        assert recall[0.99] >= 0.97, recall
        assert recall[0.95] >= 0.85, recall
        # pairs below the threshold are out of scope — none should match
        # (they sit at cosine 0.90/0.80 < 0.94, filtered by the verify)
        assert recall[0.90] == 0.0 and recall[0.80] == 0.0, recall
    finally:
        pairs.unpersist()


def test_semdedup_survivors_one_representative_per_component(small_emb):
    from praw_etl_student_dropout_spark.operators.clusters import (
        connected_components,
    )

    pairs = semdedup_pairs(
        small_emb, threshold=0.0, num_clusters=8, kmeans_iters=1, nprobe=2
    ).persist()
    try:
        surv = semdedup_survivors(small_emb, pairs)
        comps = connected_components(pairs).persist()
        losers = comps.filter(F.col("comp") != F.col("id"))
        assert surv.count() == small_emb.count() - losers.count()
        # the min-id representative of every component survives
        reps = comps.select(F.col("comp").alias("vec_id")).distinct()
        missing = reps.join(surv, "vec_id", "left_anti").count()
        assert missing == 0
        # schema passes through untouched
        assert surv.columns == small_emb.columns
        comps.unpersist()
    finally:
        pairs.unpersist()


def test_semdedup_deterministic_and_cap(small_emb):
    kwargs = dict(threshold=0.0, num_clusters=8, kmeans_iters=0, nprobe=2)
    a = sorted((r.id_a, r.id_b, r.cosine) for r in semdedup_pairs(small_emb, **kwargs).collect())
    b = sorted((r.id_a, r.id_b, r.cosine) for r in semdedup_pairs(small_emb, **kwargs).collect())
    assert a == b and len(a) > 0
    # the cluster-size cap truncates deterministically: capped ⊆ uncapped
    capped = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in semdedup_pairs(small_emb, max_cluster_size=10, **kwargs).collect()
    )
    assert set(capped) <= set(a)
    assert len(capped) < len(a)
