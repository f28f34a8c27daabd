"""Copy-on-write MERGE (upsert) for parquet tables.

The reference's only write semantic is INSERT IGNORE (first-wins,
etl_pipeline.py:122); a training-data warehouse also needs last-wins
upsert ("re-crawled document replaces the old one"). Plain parquet has
no MERGE, so this is the lakehouse copy-on-write pattern without the log:

1. read the target, 2. anti-join target←source to keep unmatched rows,
3. union with the (deduped) source, 4. write to a fresh versioned
directory, 5. atomically repoint a `_CURRENT` marker.

Readers resolve the marker first, so they never see a half-written
table; old versions remain readable until vacuumed (cheap time travel).
At 100 TB, bound the rewrite by partitioning on a merge-pruning key so
only partitions holding matched keys need rewriting; carrying untouched
files by reference instead of copying them is the Delta/Iceberg
refinement this deliberately stops short of.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = "_CURRENT"


def _current_version(base_dir: str) -> int | None:
    try:
        with open(os.path.join(base_dir, _MARKER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def current_path(base_dir: str) -> str | None:
    v = _current_version(base_dir)
    return None if v is None else os.path.join(base_dir, f"v{v}")


def read_merged(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``.

    Any version still on disk (see :func:`vacuum` retention) is
    readable — the snapshot layout makes time travel a directory pick,
    no log replay. Reading a vacuumed version raises FileNotFoundError
    with the retained versions listed.
    """
    if version is None:
        path = current_path(base_dir)
        if path is None:
            raise FileNotFoundError(f"no committed version under {base_dir}")
        return spark.read.parquet(path)
    if version not in list_versions(base_dir):
        raise FileNotFoundError(
            f"version {version} not on disk under {base_dir} "
            f"(retained: {list_versions(base_dir)})"
        )
    return spark.read.parquet(os.path.join(base_dir, f"v{version}"))


def merge_upsert(
    spark: SparkSession,
    base_dir: str,
    source: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """Last-wins upsert of ``source`` into the table at ``base_dir``.

    Within-source duplicates collapse arbitrarily (dropDuplicates) —
    give the source a deterministic tiebreak upstream if it matters.
    Returns the new version number.

    Schema EVOLUTION is additive (round-7): a source carrying new
    columns widens the table — untouched rows read NULL for them — and
    a source missing columns leaves its rows NULL there; earlier
    versions stay readable unchanged via time travel (each version
    directory is self-describing parquet). This is the mergeSchema
    write-side twin of ``readers.read_parquet_merged``.
    """
    src = source.dropDuplicates(keys)
    v = _current_version(base_dir)
    if v is None:
        merged, new_v = src, 0
    else:
        target = spark.read.parquet(os.path.join(base_dir, f"v{v}"))
        kept = target.join(src.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(src, allowMissingColumns=True)
        new_v = v + 1
    out = os.path.join(base_dir, f"v{new_v}")
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out)
    # single tiny marker write = the atomic commit point
    tmp = os.path.join(base_dir, f".{_MARKER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(new_v))
    os.replace(tmp, os.path.join(base_dir, _MARKER))
    return new_v


def list_versions(base_dir: str) -> list[int]:
    """Committed snapshot versions under ``base_dir``, oldest first."""
    try:
        names = os.listdir(base_dir)
    except FileNotFoundError:
        return []
    vs = []
    for n in names:
        if n.startswith("v") and n[1:].isdigit():
            vs.append(int(n[1:]))
    return sorted(vs)


def vacuum(base_dir: str, keep_last: int = 2) -> list[int]:
    """Snapshot retention: drop all but the newest ``keep_last`` versions.

    Old snapshots are what make the marker swap in :func:`merge_upsert`
    safe for concurrent readers (a reader that resolved ``_CURRENT``
    before a merge keeps a valid directory), so retention is a policy
    knob, not cleanup-on-write: keep enough history to cover the longest
    running reader plus any time-travel window, then vacuum. The current
    version is always kept regardless of ``keep_last``. Returns the
    versions removed. Driver-side recursive delete is fine here: it
    removes whole snapshot directories by name (listing-sized metadata
    work, same as a table format's expire-snapshots action) — the data
    files inside were written by Spark and are dropped wholesale.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("vacuum must keep at least the current version")
    cur = _current_version(base_dir)
    versions = list_versions(base_dir)
    keep = set(sorted(versions)[-keep_last:])
    if cur is not None:
        keep.add(cur)
    removed = []
    for v in versions:
        if v in keep:
            continue
        shutil.rmtree(os.path.join(base_dir, f"v{v}"))
        removed.append(v)
    return removed
