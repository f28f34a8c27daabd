"""Count-min sketch as a distributed DataFrame operator (SURVEY.md §2.4 A11 ⊕).

Companion to the HLL cardinality sketches (`a11_approx_distinct`,
`a11b_hll_sketch_union`): where HLL answers "how many distinct keys",
count-min answers "how often does THIS key occur" in sublinear space.
The sketch is an ordinary DataFrame of (sketch_row, bucket, cnt) — at
most depth x width rows regardless of input size — so it inherits
Spark's partial aggregation (map-side combine collapses each partition
to <= depth x width cells before the shuffle), is trivially mergeable
(union + re-sum, exactly how per-day sketches roll up to a month), and
broadcasts for estimation joins.

Estimates carry the classic CMS guarantee: never an underestimate, and
overestimate <= ceil(e/width * N) with probability 1 - (1/2)^depth
(hash rows are pairwise-independent xxhash64 seeds). At 100 TB this is
the only way to answer per-key frequency questions whose exact answer
would itself be a multi-TB group-by result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key: str | Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a (sketch_row, bucket, cnt) count-min sketch in ONE pass.

    Each input row contributes `depth` cells via seeded xxhash64; the
    explode fans out executor-side (no Python), and the single groupBy
    is the only shuffle — its input is already combined map-side to at
    most depth x width rows per partition.
    """
    col = F.col(key) if isinstance(key, str) else key
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_row"),
                F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.sketch_row", "c.bucket")
        .groupBy("sketch_row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): union + re-sum.

    Exact (counts are additive), which is what makes CMS a rollup-safe
    statistic: shard-, day-, or source-level sketches combine without
    revisiting the raw data.
    """
    from functools import reduce

    out = reduce(DataFrame.unionByName, sketches)
    return out.groupBy("sketch_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Estimate each key's frequency: min over the key's depth cells.

    The sketch side is <= depth x width rows, so it broadcasts; the keys
    side re-derives its (sketch_row, bucket) coordinates with the same
    seeded hashes and probes with an equi hash join — no shuffle of the
    keys beyond their own dedup.
    """
    col = F.col(key)
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_row"),
                F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probed = (
        keys.select(col.alias(key), F.explode(coords).alias("c"))
        .select(key, "c.sketch_row", "c.bucket")
        .join(F.broadcast(sketch), ["sketch_row", "bucket"], "left")
        .na.fill({"cnt": 0})
    )
    return probed.groupBy(key).agg(F.min("cnt").alias("est_count"))


def heavy_hitters(df: DataFrame, key: str, support: float = 0.01) -> DataFrame:
    """EXACT heavy hitters (frequency >= support * N) in two passes.

    Pass 1 generates candidates with Spark's built-in ``stat.freqItems``
    (the Karp/Misra-Gries counter family): a single scan whose state is
    O(1/support) per partition, with NO false negatives — every true
    heavy hitter is in the candidate list, which is driver-sized
    (<= ~1/support keys) by construction. Pass 2 counts ONLY the
    candidate keys exactly (isin prunes at the scan; the groupBy's
    aggregation state is bounded by the candidate count, never the key
    cardinality) and drops freqItems' false positives against the exact
    threshold.

    This is the cross-check companion to :func:`cms_build`: CMS answers
    point frequency queries from a mergeable sketch; this answers "which
    keys are frequent" exactly, with bounded memory at any scale — the
    exact one-shot groupBy it replaces has aggregation state
    proportional to the number of distinct keys, which at 100 TB is
    itself a multi-TB intermediate.
    """
    if not 0 < support < 1:
        raise ValueError("support must be in (0, 1)")
    # freqItems only guarantees survival for counts STRICTLY greater
    # than support*N; a key with count exactly support*N could be
    # evicted while the exact >= filter below would keep it. Running
    # candidate generation at a slightly lower support closes that
    # boundary — the candidate list stays driver-sized (~1/support).
    # Clamp to freqItems' hard lower bound (its domain is [1e-4, 1]);
    # at support == 1e-4 exactly, the boundary guarantee reverts to
    # freqItems' strict-inequality contract.
    candidates = [
        c
        for c in df.stat.freqItems([key], max(support * 0.99, 1e-4)).first()[0]
        if c is not None
    ]
    total = df.count()
    if not candidates:
        return (
            df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).limit(0)
        )
    return (
        df.filter(F.col(key).isin(candidates))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(support) * F.lit(total))
    )


def cms_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Estimate |A ⋈ B| on the sketched key from two count-min sketches.

    The true join cardinality is the inner product Σ_k a_k·b_k of the
    two key-frequency vectors; each CMS row's bucket-wise inner product
    Σ_j cnt_a[j]·cnt_b[j] overestimates it (hash collisions only ever
    ADD mass), so the MIN over the depth rows is the classic
    Cormode-Muthukrishnan estimate: never an underestimate, error
    bounded by e/width · N_a · N_b per row. This is how an optimizer
    sizes a join from metadata without touching either table — the two
    sketches are depth×width cells each, so the whole estimation joins
    broadcast-sized state. Returns one row: (est_join_size).
    """
    a = sketch_a.select("sketch_row", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("sketch_row", "bucket", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["sketch_row", "bucket"])
        .groupBy("sketch_row")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est_join_size"))


def kmv_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    seed: int = 7,
    method: str = "md5",
) -> DataFrame:
    """Bottom-k-by-hash sample: the k rows with the SMALLEST content-hash
    coin — a deterministic, MERGEABLE uniform sample (the KMV idea from
    Bar-Yossef et al. 2002 applied as a row sketch).

    Mergeable: bottom-k of a union == bottom-k of the union of per-shard
    bottom-k's, so per-partition / per-day sketches combine by
    union + re-bottom-k without touching the raw data again — the
    property that makes it a SKETCH rather than a sample job. Being a
    pure function of (id, seed) it is layout-independent and (with
    ``method="md5"``) engine-portable, so estimates built on it are
    oracle-checkable — unlike RNG reservoirs, which are neither.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition
    bottom-k, k-row driver merge).

    Returns the input columns + ``kmv_coin`` (the [0,1) coin, rounded
    to 6; selection uses the unrounded coin, ties break on id).
    """
    from .sampling import hash_coin

    coin = hash_coin(F.col(id_col), seed, method)
    return (
        df.withColumn("__coin", coin)
        .orderBy(F.asc("__coin"), F.asc(id_col))
        .limit(k)
        .withColumn("kmv_coin", F.round(F.col("__coin"), 6))
        .drop("__coin")
    )


def kmv_quantiles(
    sample: DataFrame,
    value_col: str,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a :func:`kmv_sample`: exact linear-
    interpolation percentiles OVER THE SKETCH (k rows), so the estimate
    costs O(k log k) regardless of base-table size and two sketches'
    estimates merge by re-sketching their union. Standard uniform-sample
    quantile error: |F(q̂) - q| = O(1/√k) whp — pinned with margin in
    tests/test_kmv_sketch.py. Deterministic coin ⇒ the estimate itself
    is reproducible and oracle-checkable (quantile_cont over the same
    k rows in any engine).
    """
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(
            f"q{str(q).replace('0.', '').ljust(2, '0')}"
        )
        for q in quantiles
    ] + [F.count(F.lit(1)).alias("sketch_rows")]
    if group_cols:
        return sample.groupBy(*group_cols).agg(*aggs)
    return sample.agg(*aggs)


def kmv_setops(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    k: int = 256,
    seed: int = 23,
) -> DataFrame:
    """Theta-sketch-style SET-OPERATION estimates from two bottom-k
    (KMV) sketches: distinct |A|, |B|, |A∪B|, Jaccard, and |A∩B|.

    The Datasketches theta-sketch trick (public: Dasgupta et al. 2016,
    "Theta-Sketch Framework") on the deterministic md5 coin:

    - per-set estimate: (k-1)/h_k with h_k the k-th smallest distinct
      coin (exact count when the set is smaller than k);
    - union sketch = bottom-k of the two sketches' union (KMV
      mergeability — never re-reads the raw sets);
    - Jaccard ρ̂ = |union-sketch ∩ A-sketch ∩ B-sketch| / k, and
      |A∩B| ≈ ρ̂ · |A∪B| — the classic bottom-k coordinated-sample
      estimator.

    Everything is a pure function of (ids, seed): the whole estimate —
    not just its error bound — is reproducible, layout-independent, and
    oracle-checkable in any SQL engine (unlike HLL registers, whose
    binary layout is engine-private; a11b). Cost at 100 TB: one
    distinct+TakeOrdered per side (the sketches can also be maintained
    incrementally per shard/day and merged — k-row artifacts), then
    k-row arithmetic. Ties on the 2^20-bucket coin break on id, so the
    sketch boundary is a total order on both engines.
    """
    from .sampling import hash_coin

    def sketch(df: DataFrame) -> DataFrame:
        ids = df.select(F.col(id_col).alias("id")).distinct()
        return (
            ids.withColumn("coin", hash_coin(F.col("id"), seed, "md5"))
            .orderBy("coin", "id")
            .limit(k)
        )

    ska, skb = sketch(a), sketch(b)
    sku = ska.union(skb).distinct().orderBy("coin", "id").limit(k)

    def est(stats_cnt: F.Column, stats_hk: F.Column) -> F.Column:
        return F.when(
            stats_cnt < k, stats_cnt.cast("double")
        ).otherwise((F.lit(float(k - 1))) / stats_hk)

    sa = ska.agg(
        F.count(F.lit(1)).alias("cnt_a"), F.max("coin").alias("hk_a")
    )
    sb = skb.agg(
        F.count(F.lit(1)).alias("cnt_b"), F.max("coin").alias("hk_b")
    )
    su = sku.agg(
        F.count(F.lit(1)).alias("cnt_u"), F.max("coin").alias("hk_u")
    )
    inter = (
        sku.join(ska.select("id"), "id", "left_semi")
        .join(skb.select("id"), "id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_inter_sketch"))
    )
    est_u = est(F.col("cnt_u"), F.col("hk_u"))
    jac = F.col("n_inter_sketch") / F.least(F.col("cnt_u"), F.lit(k))
    return (
        sa.crossJoin(sb)
        .crossJoin(su)
        .crossJoin(inter)
        .select(
            F.round(est(F.col("cnt_a"), F.col("hk_a")), 6).alias("est_distinct_a"),
            F.round(est(F.col("cnt_b"), F.col("hk_b")), 6).alias("est_distinct_b"),
            F.round(est_u, 6).alias("est_union"),
            F.col("n_inter_sketch").alias("n_inter_sketch"),
            F.round(jac, 6).alias("jaccard_est"),
            F.round(jac * est_u, 6).alias("est_intersection"),
        )
    )
