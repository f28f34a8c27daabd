"""Join operators (SURVEY.md §2.3 J1-J4).

The reference performs its one real join inside MySQL
(etl_pipeline.py:144-149) and hand-rolls two more as driver-side dict
lookups (J2, etl_pipeline.py:95-119) and INSERT IGNORE (J3,
etl_pipeline.py:97,106,122). Here all three are Catalyst joins:

- small dimension → ``broadcast()`` hint → BroadcastHashJoin, no shuffle
  of the fact side;
- large-large → sort-merge (Catalyst default) with AQE skew splitting;
- idempotent load → left-anti join, the distributed INSERT IGNORE.

At 100 TB the fact table never moves for dim joins; only genuinely
large-large joins shuffle, and those shuffle on the join key so
co-partitioned/bucketed layouts are reused across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_if_dim(df: DataFrame, *, bounded: bool, why: str) -> DataFrame:
    """Size-guarded broadcast hint — the single policy choke-point for
    build-side hints (r13 VERDICT #1).

    An explicit ``F.broadcast`` hint OVERRIDES
    ``spark.sql.autoBroadcastJoinThreshold``: Spark will attempt the
    broadcast at ANY size and OOM the driver instead of demoting to a
    shuffle join. That is safe only when the frame's row count is
    BOUNDED — independent of scale factor: nation/region (fixed
    domains), scalar aggregates (1 row), post-``limit(k)`` frames,
    bounded-domain group-bys (event_type, year, bin). Tables that grow
    with the data (customer, part, supplier, orders, lineitem,
    documents, embeddings, events) must NOT be force-hinted: at the
    100 TB mandate customer is ~10⁹ rows and the hint turns a plan
    choice into a crash. For those, pass ``bounded=False`` — the frame
    is returned unhinted and AQE's runtime size check decides (at
    fixture SFs it re-derives the same BroadcastHashJoin from the
    10 MB threshold; at scale it demotes to shuffle, which is the
    point).

    ``why`` documents the call-site judgment (it is not used at
    runtime); ``tools/plan_audit.py`` enforces the policy on every
    catalog entry's optimized plan, so a raw ``F.broadcast`` on a
    scaling base anywhere in the catalog fails the audit.
    """
    del why  # documentation-only
    return F.broadcast(df) if bounded else df


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, list[str] | F.Column]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1 — fact ⋈ dim ⋈ dim ... (etl_pipeline.py:144-149).

    Each dim is (df, join_key). With ``broadcast_dims`` every dim gets a
    broadcast hint: one scan of the fact side, zero fact shuffles —
    the only plan that survives a 100 TB fact table with KB-sized dims.
    """
    out = fact
    for dim, on in dims:
        if broadcast_dims:
            dim = F.broadcast(dim)
        out = out.join(dim, on=on, how="inner")
    return out


def surrogate_key_join(
    facts: DataFrame,
    dim: DataFrame,
    natural_key: str,
    surrogate_key: str,
    fact_key: str | None = None,
) -> DataFrame:
    """J2 — natural→surrogate key swap via broadcast hash join.

    Replaces the reference's driver-side dict + iterrows loop
    (etl_pipeline.py:95-119) — the canonical anti-pattern at scale —
    with a broadcast join that attaches ``surrogate_key`` and drops the
    natural key. ``fact_key`` names the fact column when it differs from
    the dim's natural key column.
    """
    fact_col = fact_key or natural_key
    cond = facts[fact_col] == dim[natural_key]
    out = facts.join(F.broadcast(dim.select(natural_key, surrogate_key)), cond, "left")
    return out.drop(dim[natural_key]).drop(fact_col)


def anti_join_new_keys(new_rows: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """J3 — rows of ``new_rows`` whose key is absent from ``existing``
    (INSERT IGNORE, etl_pipeline.py:97,106,122). Left-anti join; Catalyst
    broadcasts the smaller side or sort-merges on the keys."""
    return new_rows.join(existing.select(*keys), on=keys, how="left_anti")


def join_on_keys(left: DataFrame, right: DataFrame, keys: list[str], how: str = "inner") -> DataFrame:
    """J4 — the full join family (inner/left/right/full/semi/anti) on
    equi-keys. Thin declarative wrapper: Catalyst picks broadcast vs
    sort-merge vs shuffled-hash from stats + AQE."""
    return left.join(right, on=keys, how=how)


def theta_join(left: DataFrame, right: DataFrame, condition: F.Column, how: str = "inner") -> DataFrame:
    """J4 — non-equi (theta/range) join. Physically a
    BroadcastNestedLoopJoin when one side is small; keep the small side
    right and hint broadcast at the call site for big-small ranges."""
    return left.join(right, condition, how)


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Scalable band join: |left_ts - right_ts| <= max_gap.

    A naive theta join is O(n·m) nested-loop. Bucketing both sides to
    ``max_gap``-sized epochs and equi-joining on (bucket, bucket±1)
    turns it into a shuffle hash/sort-merge join with a cheap residual
    filter — the standard interval-join decomposition used by stream
    processors.
    """
    gap = F.lit(max_gap_seconds)
    lb = (F.unix_timestamp(F.col(left_ts)) / gap).cast("long")
    l2 = left.withColumn("__bucket", F.explode(F.array(lb - 1, lb, lb + 1)))
    r2 = right.withColumn("__bucket", (F.unix_timestamp(F.col(right_ts)) / gap).cast("long"))
    keys = ["__bucket"] + (extra_keys or [])
    joined = l2.join(r2, on=keys, how="inner")
    residual = F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))) <= gap
    return joined.filter(residual).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts within the same ``on`` key.

    Composition of existing ops (union + window) rather than a custom
    operator: tag both sides, union, sort within key partitions, carry
    the last right ROW forward with ``last(..., ignorenulls=True)`` over
    ONE struct of all right values — so every carried value comes from
    the SAME matched right row even when individual right columns are
    NULL (per-column carries would mix rows there, unlike a true ASOF
    join). One shuffle on ``on`` — same cost as a sort-merge join, no
    nested-loop blowup.

    ``tolerance_seconds`` (pandas merge_asof semantics): a match older
    than ``left_ts - tolerance`` is treated as NO match — every carried
    value nulls out, the left row survives. Staleness is judged on
    whole epoch seconds (floor), matching the j6 range-join convention,
    so the bound is engine-portable. The matched right timestamp rides
    in the carried struct either way, which is also what makes the
    check per-ROW-correct: the tolerance compares against the actual
    matched row, never a per-column carry.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(on, right_ts, *right_values)
        .withColumn("__ts", F.col(right_ts))
        .withColumn("__side", F.lit(0))
    )
    struct_type = T.StructType(
        [T.StructField(v, rt.schema[v].dataType) for v in right_values]
        + [T.StructField("__rts", rt.schema[right_ts].dataType)]
    )
    lt_aligned = lt.select(
        *[F.col(c) for c in left.columns],
        "__ts",
        "__side",
        F.lit(None).cast(struct_type).alias("__r"),
    )
    rt_aligned = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on else F.col(on) for c in left.columns],
        "__ts",
        "__side",
        F.struct(
            *[F.col(v).alias(v) for v in right_values],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    unioned = lt_aligned.unionByName(rt_aligned)
    w = W.partitionBy(on).orderBy("__ts", "__side").rowsBetween(W.unboundedPreceding, 0)
    carried = unioned.select(
        *unioned.columns,
        F.last("__r", ignorenulls=True).over(w).alias("__r_match"),
    )
    match = F.col("__r_match")
    if tolerance_seconds is not None:
        # Whole-second floor for timestamps (j6's epoch convention);
        # numeric ts columns are already in caller units.
        if isinstance(
            rt.schema[right_ts].dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            def _secs(c):
                return F.unix_timestamp(c)
        else:
            def _secs(c):
                return c.cast("long")
        fresh = (
            _secs(F.col("__ts")) - _secs(match.getField("__rts"))
        ) <= F.lit(int(tolerance_seconds))
        match = F.when(fresh, match)
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *unioned.columns,
            *[match.getField(v).alias(v) for v in right_values],
        )
        .drop("__ts", "__side", "__r")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-busting equi-join: salt the skewed (left) side, replicate the
    other side once per salt bucket.

    A hot key in a plain shuffle join lands every one of its rows in a
    single reducer; salting fans each key out over ``salt_buckets``
    reducers at the cost of replicating the right side ``salt_buckets``
    times — so use it when the right side is small-to-medium but too big
    to broadcast outright, and AQE's skew-join split (which only helps
    sort-merge joins on partition-size skew it can detect) isn't enough.
    The salt column never escapes: output schema equals a plain join's,
    and the RESULT equals a plain join's whatever the salt values are —
    which is why the graded catalog entry (j11_salted_skew_join) can
    oracle-check a salted plan against the unsalted SQL join.

    ``salt_on`` names a left column to derive the salt from
    deterministically (pmod(xxhash64(col), buckets)) — layout-independent
    and reproducible, the production default; pick a column that is
    high-cardinality WITHIN each hot key (a row id) so the hot key
    actually spreads. With ``salt_on=None`` the salt is a seeded
    per-partition rand() — fine for one-shot jobs, but the spread then
    depends on partitioning.

    Supports inner/left joins (the replicated right side makes right/full
    semantics ambiguous — every unmatched right row would appear
    ``salt_buckets`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets)).cast("int")
    else:
        salt = (F.rand(seed=7) * salt_buckets).cast("int")
    salted_left = left.withColumn("__salt", salt)
    exploded_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_left.join(exploded_right, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_unit: str = "day",
) -> DataFrame:
    """Interval × interval OVERLAP equi-join via time-bin decomposition —
    the two-sided sibling of the banded point join (j6): each interval
    explodes into the calendar bins it touches, candidates come from an
    equi-join on (keys, bin), and the exact overlap predicate verifies.
    Sharing a touched bin is NECESSARY for overlap when bins tile time,
    so the decomposition is lossless; a naive theta join is O(n·m)
    nested-loop and unrunnable at fact scale. Bin granularity trades
    fan-out (≤ interval_length/bin rows per interval) against candidate
    precision — pick it near the typical interval length.

    Returns left.* + right.* for every overlapping pair (closed
    intervals: touching endpoints overlap). Candidate dedup is by full
    row value (a pair sharing several bins emits once), so byte-equal
    duplicate input rows also collapse — give rows a distinguishing id
    if duplicate intervals must pair independently.

    Malformed intervals drop DELIBERATELY (ADVICE r7): each side is
    pre-filtered to ``start IS NOT NULL AND end IS NOT NULL AND
    start <= end`` before bin explosion. Without the guard an inverted
    interval makes ``F.sequence(later, earlier, +1 unit)`` throw an
    opaque runtime error deep in the explode, and null endpoints would
    silently null out the bin anyway — the explicit predicate makes the
    drop a documented semantic (overlap is undefined for an empty or
    unknown interval) instead of an accident. Pre-validate upstream if
    malformed rows must error instead.
    """
    def valid(start: str, end: str):
        return (
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(start) <= F.col(end))
        )

    def bins(start: str, end: str):
        return F.explode(
            F.sequence(
                F.date_trunc(bin_unit, F.col(start)),
                F.date_trunc(bin_unit, F.col(end)),
                F.expr(f"INTERVAL 1 {bin_unit}"),
            )
        )

    lb = left.filter(valid(left_start, left_end)).withColumn(
        "__bin", bins(left_start, left_end)
    )
    rb = right.filter(valid(right_start, right_end)).withColumn(
        "__bin", bins(right_start, right_end)
    )
    cands = lb.join(rb, keys + ["__bin"]).drop("__bin").dropDuplicates()
    return cands.filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
    )


def bloom_word_masks(
    build: DataFrame, key: str, m_bits: int = 1 << 16, k_hashes: int = 5
) -> DataFrame:
    """The Bloom filter as a (word, mask) DataFrame — ≤ m/64 rows.

    This is the MERGEABLE form: two filters over the same (m, k, key
    domain) merge by union + groupBy(word).bit_or(mask), which is how
    the streaming twin (stream_jobs.bloom_stream) folds each
    micro-batch into the persisted filter with bit-for-bit batch
    equality (OR is associative and commutative)."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]
    hits = build.select(
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
        ).alias("h")
    )
    return (
        hits.select("h.word", "h.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_filter_build(
    build: DataFrame, key: str, m_bits: int = 1 << 16, k_hashes: int = 5
) -> list[int]:
    """Build a Bloom filter over ``build[key]`` as a list of m/64 longs.

    Spark's own runtime row-group filtering injects exactly this shape
    (a BloomFilterAggregate scalar subquery broadcast into the probe
    scan), but ``bloom_filter_agg`` is not registered in the public
    function registry — so the engine builds the same artifact from
    public primitives: k xxhash64 probes per key, exploded to
    (word_idx, bit_mask) rows, OR-folded per word with ``bit_or``. The
    driver-side collect is BOUNDED by construction — at most m/64 rows
    (1024 longs for the 64 Kib default) regardless of build-side row
    count — the same constant-size exception as the PQ codebooks
    (operators/similarity.py): it is the *filter* that crosses the
    driver, never data.
    """
    rows = bloom_word_masks(build, key, m_bits, k_hashes).collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = r["mask"]
    return words


def bloom_might_contain(
    key: F.Column, words: list[int], k_hashes: int = 5
) -> F.Column:
    """Probe-side predicate: true iff all k bits for ``key`` are set.

    ``words`` (the bloom_filter_build artifact) is inlined as a literal
    array — ConstantFolding collapses it to one Literal, so the probe
    pays k element_at + AND ops per row, fully inside whole-stage
    codegen, with NO join, NO shuffle, and NO Python. False positives
    are possible (callers follow with the exact join); false negatives
    are impossible — the property the oracle's plain-join twin checks.
    """
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    ok = F.lit(True)
    for i in range(k_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        ok = ok & (F.element_at(arr, (F.shiftright(p, 6) + 1).cast("int")).bitwiseAND(mask) != 0)
    return ok


def bloom_semi_reduce(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """J10 — Bloom-filter semi-join reduction: cut the probe side BEFORE
    its shuffle, then take the exact semi join.

    The 100 TB shape this exists for: fact ⋈ (selectively filtered dim
    keys) where the key set is too large to broadcast as a hash set but
    the *fact* side dominates the shuffle. A constant-size bloom (8 KiB
    default) rides to every probe task as a folded literal and drops
    most non-matching rows at the scan, so the exchange only carries
    survivors; the exact semi join afterwards removes the bloom's false
    positives — the result is bit-identical to the plain semi join
    (which is exactly what the DuckDB oracle computes).
    """
    words = bloom_filter_build(build.select(build_key), build_key, m_bits, k_hashes)
    reduced = probe.filter(bloom_might_contain(F.col(probe_key), words, k_hashes))
    return reduced.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        on=probe_key,
        how="left_semi",
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_val: str,
    right_val: str,
    eps: float,
) -> DataFrame:
    """Numeric ε-band equi-accelerated join: pairs with
    ``|left_val - right_val| <= eps`` (plus the key equality) — the
    value-space sibling of the time-bin interval join above, used for
    sensor alignment, price matching, and numeric near-dup blocking.

    A naive theta join is an O(n·m) nested loop. Quantizing both sides
    to ``eps``-wide bins makes bin adjacency NECESSARY for the band
    predicate (two values within eps differ by at most one bin), so the
    left side explodes into its bin and both neighbors (3 rows), the
    join is a plain hash equi-join on (keys..., bin), and the exact
    band predicate verifies — lossless, with candidate fan-out bounded
    by 3x the per-bin occupancy. Null values drop (band distance to an
    unknown value is undefined), mirroring interval_overlap_join's
    deliberate-drop contract.
    """
    bw = float(eps)
    lbin = F.floor(F.col(left_val) / F.lit(bw)).cast("long")
    rbin = F.floor(F.col(right_val) / F.lit(bw)).cast("long")
    lb = (
        left.filter(F.col(left_val).isNotNull())
        .withColumn("__bin", F.explode(F.array(lbin - 1, lbin, lbin + 1)))
    )
    rb = right.filter(F.col(right_val).isNotNull()).withColumn("__bin", rbin)
    return (
        lb.join(rb, keys + ["__bin"])
        .filter(F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(bw))
        .drop("__bin")
    )
