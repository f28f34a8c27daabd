"""Pretraining sequence packing (SURVEY.md §2.9 U6 ⊕ — LLM-pipeline mandate).

The concat-and-chunk step of a pretraining data pipeline: documents are
(deterministically) shuffled, logically concatenated in shuffle order,
and the token stream is cut into fixed-size training sequences. Each
document's placement is fully described by the running token offset at
which it starts — so the whole operator is one exclusive prefix sum
over the shuffled order.

A naive ``sum() OVER (ORDER BY ...)`` with no PARTITION BY collapses to
a single-partition window — the one shape this engine bans at scale.
Instead :func:`pack_sequences` computes the distributed prefix sum:

1. ``repartitionByRange`` on the shuffle order → every partition holds a
   CONTIGUOUS slice of the global order (whatever the sampled split
   points were, the final offsets are partition-layout-independent);
2. a per-partition running sum (ordinary partitioned window);
3. per-partition totals — at most one row per partition — prefix-summed
   on a frame that small by construction, then broadcast-joined back.

The shuffle key is a Knuth multiplicative hash of the doc id (exact in
BIGINT arithmetic, reproducible in ANSI SQL for the oracle, and stable
across runs/seeds-by-multiplier) — a deterministic global shuffle,
which is what makes packed corpora reproducible between pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 4294967296


def shuffle_key(col, multiplier: int = KNUTH, mod: int = MOD):
    """Deterministic pseudo-shuffle position (Knuth multiplicative hash)."""
    return (col.cast("long") * F.lit(multiplier)) % F.lit(mod)


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns the input plus: ``shuffle_key`` (global order), ``cum_tokens``
    (inclusive prefix sum), ``seq_first``/``seq_last`` (training-sequence
    ids the doc lands in; differ when the doc straddles a cut) and
    ``seq_offset`` (token offset within seq_first).
    """
    key = shuffle_key(F.col(id_col)).cast("long")
    toks = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        key.alias("shuffle_key"),
    )
    if num_partitions:
        toks = toks.repartitionByRange(num_partitions, "shuffle_key", id_col)
    else:
        toks = toks.repartitionByRange("shuffle_key", id_col)
    toks = toks.withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("_pid")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = toks.withColumn("local_cum", F.sum("n_tokens").over(local_w))
    # Materialize ONCE before the totals/join fork: RangePartitioner
    # seeds its bound sampling with the RDD id, so if Catalyst fails to
    # reuse the range exchange across the two branches (it does fail on
    # join lineages — round-10, global_rank docstring), the branches
    # would otherwise see DIFFERENT partition layouts and the prefix
    # sum comes out wrong. Tracked → released by the session cache
    # contract (bench fairness unchanged).
    from ..plans.cache_registry import track

    local = track(local)
    totals = local.groupBy("_pid").agg(F.sum("n_tokens").alias("_total"))
    # One row per partition: this window's frame is the partition COUNT,
    # not the data size — the only safe unpartitioned window shape.
    offset_w = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_total").over(offset_w), F.lit(0)).alias("_offset")
    )
    packed = local.join(F.broadcast(offsets), "_pid").withColumn(
        "cum_tokens", F.col("local_cum") + F.col("_offset")
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    return packed.select(
        id_col,
        "n_tokens",
        "shuffle_key",
        "cum_tokens",
        F.floor(start / seq_len).cast("long").alias("seq_first"),
        F.floor((F.col("cum_tokens") - 1) / seq_len).cast("long").alias("seq_last"),
        (start % seq_len).cast("long").alias("seq_offset"),
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_name: str = "__rank",
    num_partitions: int | None = None,
    track_cache: bool = True,
) -> DataFrame:
    """Distributed global row_number over ``order_cols`` — the
    pack_sequences prefix-sum pattern with count instead of sum:
    range-partition on the order (each partition = a contiguous slice of
    the global order), per-partition running count, per-partition totals
    (≤ num_partitions rows — the one safe unpartitioned-window shape)
    prefix-summed and broadcast back. Never a single-partition window.

    ``order_cols`` must be a total order (append the id column) or ties
    make the rank layout-dependent. One documented exception (round-11
    ADVICE): a caller that consumes only the VALUES of ``order_cols`` at
    selected ranks — order statistics such as rank-select medians — may
    pass a non-total order, because the value at rank k is identical
    under every tie layout (a64_theil_sen does this). Such callers must
    never propagate ``rank_name`` itself downstream.

    ``track_cache`` (default True) persists the locally-ranked frame
    (via plans.cache_registry.track) before the totals/join fork. This
    is a CORRECTNESS guarantee, not an optimization, whenever Catalyst
    does not reuse the range exchange across the two branches: Spark's
    RangePartitioner seeds its bound-sampling reservoir with the RDD
    id, so two physical instances of the "same" exchange draw DIFFERENT
    bounds — _pid then means different slices in the totals branch and
    the join branch, and ranks come out with gaps/overlaps (caught
    round-10 on a64_theil_sen, whose self-join lineage defeated
    ReuseExchange; simple scan lineages dedupe fine, but that is plan
    luck, not a contract). Only disable it for a caller that owns its
    own materialization of the input order.
    """
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        d = df.repartitionByRange(num_partitions, *cols)
    else:
        d = df.repartitionByRange(*cols)
    d = d.withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("__local_rn", F.count(F.lit(1)).over(local_w))
    if track_cache:
        from ..plans.cache_registry import track

        local = track(local)
    totals = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_total"))
    offset_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_total").over(offset_w), F.lit(0)).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, (F.col("__local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "__local_rn", "_offset")
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str,
    difficulty_col: str,
    stages: int = 5,
    seed: int = 17,
    num_partitions: int | None = None,
) -> DataFrame:
    """Curriculum training order: rank by ``difficulty_col`` (easy →
    hard), cut the ranked corpus into ``stages`` equal slices, then
    deterministically shuffle WITHIN each stage by a content-hash key so
    intra-stage order carries no collection bias. Output adds ``stage``
    (1-based) and ``order_idx`` (the global training order).

    Stage assignment is exact integer arithmetic on the global rank
    (((r-1)·stages) div n + 1), reproducible in ANSI SQL for the oracle
    — no ntile, whose tie handling is engine-specific. Both global ranks
    are :func:`global_rank` distributed prefix counts, so nothing here
    is a single-partition window; the order is a pure function of the
    corpus + seed (md5 shuffle key, the sampling-coin convention).
    """
    base = docs.select(F.col(id_col), F.col(difficulty_col))
    ranked = global_rank(
        base, [difficulty_col, id_col], "__r", num_partitions=num_partitions
    )
    tot = base.agg(F.count(F.lit(1)).alias("__n"))
    staged = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "stage",
        (
            F.expr(f"((__r - 1) * {int(stages)}) div __n") + F.lit(1)
        ).cast("int"),
    )
    shuf = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    final = global_rank(
        staged.withColumn("__shuf", shuf),
        ["stage", "__shuf", id_col],
        "order_idx",
        num_partitions=num_partitions,
    )
    return final.select(id_col, difficulty_col, "stage", "order_idx")
