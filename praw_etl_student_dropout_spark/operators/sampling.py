"""Sampling & dataset-mixing operators (training-data mandate).

Every pretraining corpus is assembled by sampling: quality-stratified
rates, per-source mixing weights, reproducible seeds. All of it is
narrow (no shuffle) — each partition flips its own seeded coins, so the
operators scale linearly and re-runs are bit-reproducible for a fixed
seed and partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_fraction(df: DataFrame, fraction: float, seed: int = 7) -> DataFrame:
    """Bernoulli sample: keep each row with probability ``fraction``."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 7
) -> DataFrame:
    """Per-stratum rates (e.g. keep 100% of high-quality docs, 10% of
    low): ``sampleBy`` evaluates one seeded coin per row against its
    stratum's fraction — strata absent from ``fractions`` drop entirely."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def mix_sources(
    sources: list[tuple[DataFrame, float]], seed: int = 7
) -> DataFrame:
    """Weighted dataset mixing: union each source sampled at its rate.

    ``sources`` is [(df, keep_fraction), ...] — the "data mixture" step
    of corpus assembly (e.g. 3 epochs of wiki ≈ fraction 1.0 three times,
    0.3 of web crawl). Sampling happens before the union, so the plan
    stays a narrow union of filtered scans; nothing shuffles until the
    consumer asks for it.
    """
    if not sources:
        raise ValueError("mix_sources needs at least one (df, fraction)")
    parts = []
    for i, (df, frac) in enumerate(sources):
        part = df if frac >= 1.0 else df.sample(False, frac, seed=seed + i)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    buckets: tuple[int, int] = (8, 9),
) -> DataFrame:
    """Train/val/test assignment that near-duplicates can never straddle.

    A content-hash split of doc ids (sample_hash_split) silently leaks:
    a near-duplicate of a training document lands in the eval set with
    probability ~20%, and the eval metric measures memorization. The fix
    is to split by duplicate CLUSTER, not by document: connected
    components over the near-dup pair graph label every doc with its
    cluster's min id (docs with no dup edges are their own cluster), and
    the md5 bucket is computed on the CLUSTER id — every member of a
    cluster therefore shares a bucket by construction, not by audit.

    Returns (id_col, comp, split). The components loop touches only docs
    that appear in ``dup_pairs`` (the dup graph, tiny next to the
    corpus); the corpus-sized work is one left join + one projection.
    """
    from .clusters import connected_components

    labels = connected_components(dup_pairs).withColumnRenamed("id", id_col)
    comp = docs.select(id_col).join(labels, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("comp"), F.col(id_col)).alias("comp"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("comp").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )
    val_b, test_b = buckets
    return comp.select(
        id_col,
        "comp",
        F.when(bucket == val_b, "val")
        .when(bucket == test_b, "test")
        .otherwise("train")
        .alias("split"),
    )
