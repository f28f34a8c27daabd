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
