"""Table-maintenance operators a 100 TB parquet warehouse needs.

The reference never manages storage (its sink is a managed MySQL table,
etl_pipeline.py:121-127); at lake scale the engine owns layout. Three
operators cover the maintenance loop:

- ``write_clustered`` — the well-formed write: hash-distribute by the
  partition key so each Hive partition is produced by one task wave,
  sort within tasks for run-length/dictionary-friendly row groups, and
  cap records per file so no file outgrows a single task's read.
- ``compact_parquet`` — heal the small-file problem streaming/idempotent
  appends create: bin-pack a directory's data files into
  ``target_file_bytes``-sized outputs and atomically swap the directory.
- ``zorder_by`` — multi-dimensional clustering: interleave the bits of
  per-column rank buckets into one z-value and range-partition + sort by
  it, so per-file min/max envelopes are tight in EVERY clustered column
  and predicate-pushdown row-group skipping works for all of them, not
  just the leading sort key.

All three are driver-light: listings use the JVM Hadoop FileSystem (works
on HDFS/S3A the same as local), and every data movement is a single
declarative Spark job. The FileSystem access needs a classic session
(``_jvm``); under Spark Connect run compaction as a server-side job —
``write_clustered`` and ``zorder_by`` are pure DataFrame code and work
anywhere.
"""

from __future__ import annotations

from functools import reduce
from math import ceil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned + sorted + size-capped parquet write.

    ``repartition(partition_cols)`` co-locates each output partition's
    rows in one task (no N-files-per-task explosion: without it every
    task writes a sliver of every partition — the classic small-file
    generator), ``sortWithinPartitions`` orders rows inside each file so
    min/max row-group stats are selective, and ``maxRecordsPerFile``
    bounds file size without an extra shuffle.
    """
    out = df
    if partition_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def data_file_sizes(spark: SparkSession, path: str) -> list[int]:
    """Byte sizes of the data files under ``path`` (recursive, skipping
    _SUCCESS/_metadata/dotfiles), via the Hadoop FileSystem API so the
    same call works against local, HDFS, or object-store paths."""
    fs, hpath, _ = _fs_and_path(spark, path)
    sizes: list[int] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        sizes.append(status.getLen())
    return sizes


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Bin-pack a parquet directory's files toward ``target_file_bytes``.

    Reads the directory, rewrites it as ``ceil(total_bytes / target)``
    files (optionally re-sorted — compaction is the cheapest moment to
    restore clustering), then swaps directories with two FileSystem
    renames so readers never observe a half-written table. Returns
    before/after file counts and bytes for observability.

    The rewrite is one repartition job: at warehouse scale run it per
    Hive partition (pass the partition directory as ``path``) so the
    shuffle stays bounded by one partition's data, not the table.
    """
    before = data_file_sizes(spark, path)
    total = sum(before)
    n_files = max(1, ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)

    fs, hpath, jvm = _fs_and_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_old")
    if fs.exists(tmp):
        fs.delete(tmp, True)
    out.write.mode("overwrite").parquet(tmp.toString())
    if not fs.rename(hpath, old):  # swap: path -> old, tmp -> path
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compact: could not publish compacted {path}")
    fs.delete(old, True)
    # The swap happened behind Spark's file-status cache (metadataCacheTTL
    # defaults to "forever"), so this session would keep planning scans
    # against the pre-compaction listing — invalidate it.
    spark.catalog.refreshByPath(path)
    after = data_file_sizes(spark, path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes_before": total,
        "bytes_after": sum(after),
    }


def zorder_by(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 12,
) -> DataFrame:
    """Cluster ``df`` on the z-order (Morton) curve over ``cols``.

    Each (numeric/date) column is scaled into a ``bits``-bit bucket
    against its global [min, max] — the stats come from a broadcast
    one-row aggregate joined back in, so the whole transform is lazy and
    shuffle-free until the final range partition (a global-rank window
    here would funnel 100 TB through one task). The buckets' bits are
    interleaved JVM-side into one long and the frame is
    range-partitioned + sorted by that z-value. Writing the result gives
    files whose min/max envelope is tight in every clustered column —
    multi-column row-group skipping, where a plain sort only serves its
    leading column. ``bits * len(cols)`` must fit a long (≤ 63). Value
    scaling (not ranking) keeps it distributed; heavy skew widens some
    buckets but never breaks correctness.
    """
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*cols = {bits * len(cols)} exceeds a long")

    n_buckets = 1 << bits
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__max{i}") for i, c in enumerate(cols)],
    )
    joined = df.join(F.broadcast(stats))
    buckets = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__min{i}"), F.col(f"__max{i}")
        span = hi - lo
        scaled = F.floor((F.col(c).cast("double") - lo) / span * n_buckets)
        b = F.when(span > 0, F.least(scaled, F.lit(n_buckets - 1))).otherwise(F.lit(0))
        buckets.append(F.coalesce(b, F.lit(0)).cast("long").alias(f"__b{i}"))
    with_buckets = joined.select(*df.columns, *buckets)

    # bit i of bucket j lands at interleaved position i*len(cols)+j
    parts = [
        F.shiftleft(
            F.shiftright(F.col(f"__b{j}"), i).bitwiseAND(F.lit(1)),
            i * len(cols) + j,
        )
        for i in range(bits)
        for j in range(len(cols))
    ]
    z = reduce(lambda a, b: a.bitwiseOR(b), parts).cast("long")
    return (
        with_buckets.withColumn("__z", z)
        .repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__b{i}" for i in range(len(cols))])
    )


def _stats_aggs(cols: list[str]) -> list:
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return aggs


def file_stats_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-data-file min/max/null-count index — the manifest statistics a
    table format (Iceberg/Delta) would keep, built for a plain parquet
    directory. One scan groups by ``input_file_name()``; the result is one
    row per data file, so the index is listing-sized, not data-sized, and
    can be persisted and refreshed incrementally after compaction
    (:func:`refresh_file_stats`). Pair with :func:`pruned_read` for scan
    planning.
    """
    df = spark.read.parquet(path)
    return df.groupBy(F.input_file_name().alias("file")).agg(*_stats_aggs(cols))


def data_file_paths(spark: SparkSession, path: str) -> list[str]:
    """Fully-qualified URIs of the data files under ``path`` (recursive,
    skipping _SUCCESS/_metadata/dotfiles) — same normalization that
    ``input_file_name()`` produces, so index rows and listings join."""
    fs, hpath, _ = _fs_and_path(spark, path)
    out: list[str] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        if p.getName().startswith(("_", ".")):
            continue
        out.append(p.toUri().toString())
    return out


def _norm_uri(uri: str) -> str:
    """Scheme/slash-insensitive file identity (``file:///x`` == ``file:/x``)."""
    if "://" in uri:
        scheme, rest = uri.split("://", 1)
    elif ":/" in uri:
        scheme, rest = uri.split(":/", 1)
    else:
        scheme, rest = "", uri
    return f"{scheme}:/{rest.lstrip('/')}"


def refresh_file_stats(
    spark: SparkSession, path: str, cols: list[str], prior: DataFrame
) -> DataFrame:
    """Incrementally refresh a :func:`file_stats_index` after appends or
    :func:`compact_parquet`.

    Compares the directory listing against the index's file set — both
    listing-sized driver metadata, exactly the coordinator work a table
    format's manifest refresh does — then (1) keeps prior rows whose
    files still exist, (2) scans ONLY the new files for their stats, and
    unions. After a full compaction every file is new and this degrades
    gracefully to a rebuild; after an append only the appended files are
    read, so the refresh cost tracks the delta, not the table.
    """
    listing = {_norm_uri(u): u for u in data_file_paths(spark, path)}
    prior_files = [r.file for r in prior.select("file").collect()]
    prior_norm = {_norm_uri(f) for f in prior_files}
    still_present = [f for f in prior_files if _norm_uri(f) in listing]
    new_files = [u for n, u in listing.items() if n not in prior_norm]
    kept = prior.filter(F.col("file").isin(still_present)) if still_present else prior.limit(0)
    if not new_files:
        return kept
    fresh = (
        spark.read.parquet(*new_files)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*_stats_aggs(cols))
    )
    return kept.unionByName(fresh)


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Scan only the files whose [min, max] envelope intersects [lo, hi].

    The candidate file list is collected driver-side — deliberately: at
    any scale, manifest pruning is coordinator work over listing-sized
    metadata (exactly what Iceberg planning does), and it happens BEFORE
    the distributed scan is launched, so the executors never open a file
    the predicate rules out. The data-level filter must still be applied
    by the caller (envelopes admit false positives, never false
    negatives); files that are all-NULL in ``col`` have NULL min/max and
    are excluded, matching a NULL-rejecting range predicate.
    """
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}") <= F.lit(hi))
    files = [r.file for r in stats.filter(cond).select("file").collect()]
    if not files:
        # Preserve the schema contract on an empty prune
        any_file = [r.file for r in stats.select("file").limit(1).collect()]
        empty = spark.read.parquet(*any_file) if any_file else None
        if empty is None:
            raise ValueError("pruned_read: stats index is empty")
        return empty.limit(0)
    return spark.read.parquet(*files)


def file_bloom_index(
    spark: SparkSession,
    path: str,
    col: str,
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
) -> DataFrame:
    """Per-data-file Bloom filter on ``col`` — the skipping index's
    point-lookup complement (round-7; the Delta/Iceberg bloom analog for
    plain parquet). min/max envelopes (:func:`file_stats_index`) prune
    RANGES but admit every file whose envelope happens to span a probed
    key; the bloom prunes EQUALITY probes file-by-file with a bounded
    false-positive rate and zero false negatives.

    One scan: each value explodes into its k (word, mask) bit positions
    (the joins.bloom_word_masks math, xxhash64 seeded per hash), OR-
    folded per (file, word). Index size ≤ files × m/64 rows — listing-
    scaled, not data-scaled; persist it and refresh per compaction like
    the stats index. Pair with :func:`pruned_read_bloom`.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(col)
    )
    pos = [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]
    hits = df.filter(F.col(col).isNotNull()).select(
        "file",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.shiftright(p, 6).alias("word"),
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                        ).alias("mask"),
                    )
                    for p in pos
                ]
            )
        ).alias("h"),
    )
    return (
        hits.select("file", "h.word", "h.mask")
        .groupBy("file", "word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def pruned_read_bloom(
    spark: SparkSession,
    bloom_idx: DataFrame,
    col: str,
    value,
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
) -> DataFrame:
    """Scan only the files whose Bloom filter says ``col = value`` MIGHT
    match (coordinator-side planning over the listing-sized index, the
    pruned_read contract: false positives possible, false negatives
    never). (m_bits, k_hashes) must match the index build. A file with
    no row for a probed word has that bit 0 and is pruned.

    Type contract: the probe value must hash as the SAME Spark type the
    index hashed — python ints are cast to LONG here (xxhash64(int) !=
    xxhash64(long)), matching bigint key columns; for an int32 column
    pass a pre-cast Column as ``value``."""
    from pyspark.sql import Column

    if isinstance(value, Column):
        probe_col = value
    elif isinstance(value, int):
        probe_col = F.lit(value).cast("long")
    else:
        probe_col = F.lit(value)
    probe = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(probe_col, F.lit(i)), F.lit(m_bits)).alias(f"p{i}")
            for i in range(k_hashes)
        ]
    ).first()
    needed: dict[int, int] = {}
    for i in range(k_hashes):
        p = probe[f"p{i}"]
        needed[p >> 6] = needed.get(p >> 6, 0) | (1 << (p % 64))
    rows = bloom_idx.filter(
        F.col("word").isin(list(needed))
    ).collect()
    masks: dict[str, dict[int, int]] = {}
    for r in rows:
        masks.setdefault(r.file, {})[r.word] = r.mask
    files = [
        f
        for f, words in masks.items()
        if all(words.get(w, 0) & m == m for w, m in needed.items())
    ]
    if not files:
        any_file = [r.file for r in bloom_idx.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("pruned_read_bloom: bloom index is empty")
        return spark.read.parquet(*any_file).limit(0)
    return spark.read.parquet(*files)
